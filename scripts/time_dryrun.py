"""Time / golden-compute the multichip dryrun on the virtual CPU mesh.

Usage:
  python scripts/time_dryrun.py both      # per-phase wall times, sharded steps
  python scripts/time_dryrun.py anchor    # anchor family only
  python scripts/time_dryrun.py query     # query family only
  python scripts/time_dryrun.py single    # SINGLE-DEVICE losses (the goldens
                                          # committed in __graft_entry__.GOLDEN_LOSS)
Options: --flags "..." (extra XLA_FLAGS for the child), --cache (enable the
persistent compilation cache, as the real dryrun does).

Re-execs itself with the 8-device CPU platform and prints per-phase wall
times so compile-time levers can be A/B'd. Uses the EXACT models/batch of
``__graft_entry__.dryrun_models`` so measured times and goldens transfer.
"""
import os
import subprocess
import sys
import time

WHICH = sys.argv[1] if len(sys.argv) > 1 else "both"

if os.environ.get("_TIMING_CHILD") != "1":
    extra = ""
    if "--flags" in sys.argv:
        extra = sys.argv[sys.argv.index("--flags") + 1]
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count=8 {extra}".strip()
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["_TIMING_CHILD"] = "1"
    t0 = time.time()
    rc = subprocess.run([sys.executable, __file__] + sys.argv[1:], env=env).returncode
    print(f"TOTAL wall: {time.time() - t0:.1f}s rc={rc}")
    sys.exit(rc)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

t0 = time.time()


def mark(label):
    print(f"[{time.time() - t0:7.1f}s] {label}", flush=True)


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402
from rsprompter_tpu.engine.optim import build_optimizer  # noqa: E402
from rsprompter_tpu.engine.train_state import (  # noqa: E402
    TrainState,
    make_sharded_train_step,
    make_train_step,
)
from rsprompter_tpu.parallel.mesh import DEFAULT_TP_RULES, make_mesh  # noqa: E402

if "--cache" in sys.argv:
    graft._enable_compile_cache()

mark("imports done")

n_data, n_model = 4, 2
_, anchor_model, query_model, batch = graft.dryrun_models(n_data)
mark("models+batch built")


def run_family(name, model, sharded):
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    ))()
    mark(f"{name}: init done")
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-4, total_steps=100,
        freeze_paths=["backbone", "shared_image_embedding", "mask_decoder",
                      "no_mask_embed"],
    )
    state = TrainState.create(variables["params"], variables.get("batch_stats"), tx)
    if sharded:
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        step, state = make_sharded_train_step(
            model, tx, mesh, state, batch, tp_rules=DEFAULT_TP_RULES, zero=True
        )
        mark(f"{name}: sharded step built")
    else:
        step = make_train_step(model, tx, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])
    kind = "sharded" if sharded else "single-device"
    mark(f"{name}: {kind} step executed, loss={loss:.6f}")
    return loss


if WHICH == "single":
    losses = {
        "anchor": run_family("anchor", anchor_model, sharded=False),
        "query": run_family("query", query_model, sharded=False),
    }
    print(f"GOLDEN_LOSS = {losses!r}")
else:
    if WHICH in ("anchor", "both"):
        run_family("anchor", anchor_model, sharded=True)
    if WHICH in ("query", "both"):
        run_family("query", query_model, sharded=True)
