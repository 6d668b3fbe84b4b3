"""Time loss/predict steps of the detector families on the chip.

VERDICT round-1 weak #5/#6: the query variant's Hungarian host-callback cost
and the anchor loss step @1024^2 were unmeasured. Times with the scan-slope
method (predict) or repeated host-timed steps (loss paths that contain
pure_callback cannot sit inside lax.scan, so those use per-call timing over
enough reps to amortize dispatch).

Usage: python scripts/time_models.py [anchor_loss|query_loss|anchor_pred|query_pred ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.apis.build import build_detector
from rsprompter_tpu.core.config import Config
from rsprompter_tpu.utils.testing import demo_batch

BS = 2
IMG = 1024


def _setup(config_path, bs=BS, img=IMG):
    cfg = Config.fromfile(config_path)
    model = build_detector(cfg.model)
    b = demo_batch(batch_size=bs, image_size=(img, img), max_gt=8, num_classes=10)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda: model.init(rng, batch, jax.random.PRNGKey(1), method="loss")
    )()
    return model, params, batch


def _time_host(fn, *args, warmup=5, reps=10):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[...]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[...]
    return (time.perf_counter() - t0) / reps


def anchor_loss():
    model, params, batch = _setup("configs/rsprompter/rsprompter_anchor-nwpu.py")

    @jax.jit
    def step(params, batch):
        return model.apply(params, batch, jax.random.PRNGKey(2), method="loss",
                           mutable=["batch_stats"])[0]

    dt = _time_host(step, params, batch)
    print(f"anchor loss  @{IMG}^2 bs{BS}: {dt * 1e3:8.1f} ms/step", flush=True)


def query_loss():
    model, params, batch = _setup("configs/rsprompter/rsprompter_query-nwpu.py")

    @jax.jit
    def step(params, batch):
        return model.apply(params, batch, jax.random.PRNGKey(2), method="loss",
                           mutable=["batch_stats"])[0]

    dt = _time_host(step, params, batch)
    print(f"query loss   @{IMG}^2 bs{BS}: {dt * 1e3:8.1f} ms/step", flush=True)


def anchor_pred():
    model, params, batch = _setup("configs/rsprompter/rsprompter_anchor-nwpu.py")

    @jax.jit
    def step(params, batch):
        return model.apply(params, batch, method="predict")

    dt = _time_host(step, params, batch)
    print(f"anchor pred  @{IMG}^2 bs{BS}: {dt * 1e3:8.1f} ms/batch "
          f"({dt / BS * 1e3:.1f} ms/img)", flush=True)


def query_pred():
    model, params, batch = _setup("configs/rsprompter/rsprompter_query-nwpu.py")

    @jax.jit
    def step(params, batch):
        return model.apply(params, batch, method="predict")

    dt = _time_host(step, params, batch)
    print(f"query pred   @{IMG}^2 bs{BS}: {dt * 1e3:8.1f} ms/batch "
          f"({dt / BS * 1e3:.1f} ms/img)", flush=True)


if __name__ == "__main__":
    fns = {
        "anchor_loss": anchor_loss,
        "query_loss": query_loss,
        "anchor_pred": anchor_pred,
        "query_pred": query_pred,
    }
    for name in sys.argv[1:] or list(fns):
        fns[name]()
