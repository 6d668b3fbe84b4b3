"""A/B the Pallas backward kernels against the XLA-recompute backwards.

Times the anchor-family train step @1024^2 bs2 twice in SUBPROCESSES (the
env gate is read at trace time, so both variants need fresh processes):

  RSPROMPTER_PALLAS_BWD=1   flash-style Pallas backwards (round-3 kernels)
  RSPROMPTER_PALLAS_BWD=0   XLA recompute (round-2 behavior)

Run on the TPU: ``python scripts/perf_bwd_kernels.py [--config CFG] [--bs 2]``.

RESULT (round 3, on-chip): anchor train step @1024^2 bs2 = 354.2 ms (Pallas
bwd) vs 352.4 ms (XLA recompute) in this per-step-round-trip harness — a
wash. XLA's rematerialized backward already saturates the path, so the
default is OFF (``RSPROMPTER_PALLAS_BWD=1`` opts in; the kernels stay
parity-tested). Kept for re-running the A/B after encoder-side changes.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp, numpy as np, optax
from rsprompter_tpu.apis.build import build_detector
from rsprompter_tpu.core.config import Config
from rsprompter_tpu.engine.train_state import TrainState, make_train_step
from rsprompter_tpu.utils.testing import demo_batch

cfg = Config.fromfile({config!r})
bs = {bs}
model = build_detector(cfg.model)
b = demo_batch(batch_size=bs, image_size=(1024, 1024), max_gt=8,
               num_classes=cfg.model.get("num_classes", 10))
batch = {k: jnp.asarray(v) for k, v in b.items()}
rng = jax.random.PRNGKey(0)
variables = jax.jit(
    lambda: model.init(rng, batch, jax.random.PRNGKey(1), method="loss")
)()
tx = optax.adamw(1e-4, weight_decay=0.05)
state = TrainState.create(variables["params"], variables.get("batch_stats"), tx)
step = make_train_step(model, tx)

def run(s):
    s, m = step(s, batch, rng)
    np.asarray(m["loss"])[...]  # force the round trip
    return s

for _ in range(5):
    state = run(state)
t0 = time.perf_counter()
reps = 10
for _ in range(reps):
    state = run(state)
dt = (time.perf_counter() - t0) / reps
print(f"RESULT {dt * 1e3:.1f} ms/step", flush=True)
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="configs/rsprompter/rsprompter_anchor-nwpu.py")
    p.add_argument("--bs", type=int, default=2)
    args = p.parse_args()
    config = os.path.join(REPO, args.config)
    code = _WORKER.replace("{repo!r}", repr(REPO)).replace(
        "{config!r}", repr(config)).replace("{bs}", str(args.bs))

    results = {}
    for flag in ("1", "0"):
        env = dict(os.environ, RSPROMPTER_PALLAS_BWD=flag)
        print(f"--- RSPROMPTER_PALLAS_BWD={flag} ---", flush=True)
        out = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True,
        )
        print(out.stdout[-800:])
        if out.returncode != 0:
            print(out.stderr[-1500:])
            results[flag] = None
            continue
        m = re.search(r"RESULT ([\d.]+) ms/step", out.stdout)
        results[flag] = float(m.group(1)) if m else None
    if results.get("1") is not None and results.get("0") is not None:
        print(f"pallas bwd {results['1']:.1f} ms vs xla bwd "
              f"{results['0']:.1f} ms "
              f"({results['0'] / results['1']:.2f}x)")


if __name__ == "__main__":
    main()
