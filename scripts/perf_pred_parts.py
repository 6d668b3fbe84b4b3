"""Anchor-predict decomposition @1024^2 bs2: device compute vs host transfer.

time_models.py's predict numbers force a full transfer of the outputs —
mask_probs is (B, 100, 256, 256) fp32 = 52 MB at bs2, and the tunnel link
is slow. Separate the two:

  device   scan-chained predict, scalar out (pure device compute)
  full     predict + device_get of all outputs (what serving pays)
  u8       predict + transfer with mask probs quantized to uint8 on device

Usage: python scripts/perf_pred_parts.py
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

BS, IMG = 2, 1024


def main():
    cfg = Config.fromfile("configs/rsprompter/rsprompter_anchor-nwpu.py")
    model = build_detector(cfg.model)
    b = demo_batch(batch_size=BS, image_size=(IMG, IMG), max_gt=8, num_classes=10)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1),
                           method="loss")
    )()

    @jax.jit
    def pred_full(params, batch):
        return model.apply(params, batch, method="predict")

    from rsprompter_tpu.ops.masks import pack_mask_bits, quantize_probs_u8

    @jax.jit
    def pred_u8(params, batch):
        dets, probs = model.apply(params, batch, method="predict")
        return dets, quantize_probs_u8(probs)

    @jax.jit
    def pred_bits(params, batch):
        dets, probs = model.apply(params, batch, method="predict")
        return dets, pack_mask_bits(probs)

    # pure device compute: chain N predicts, return one scalar. The carried
    # image must depend on the previous iteration's output, else XLA hoists
    # the loop-invariant predict out of the scan (observed: 2.5 ms/batch).
    def make_chain(n):
        @jax.jit
        def prog(params, batch):
            def body(img, _):
                b = dict(batch, images=img)
                dets, probs = model.apply(params, b, method="predict")
                eps = (probs.mean() * 1e-9 + dets.scores.mean() * 1e-9)
                return img * (1.0 + eps.astype(img.dtype)), ()
            img, _ = jax.lax.scan(body, batch["images"], None, length=n)
            return img.mean()
        return prog

    lo, hi = make_chain(1), make_chain(4)
    for _ in range(3):
        float(np.asarray(lo(params, batch)))
        float(np.asarray(hi(params, batch)))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(lo(params, batch))); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(hi(params, batch))); th = time.perf_counter() - t0
        dts.append((th - tl) / 3)
    print(f"device   {min(dts)*1e3:8.1f} ms/batch", flush=True)

    def timed_transfer(fn, label):
        for _ in range(5):
            out = fn(params, batch)
            jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = fn(params, batch)
            jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        print(f"{label:8s} {(time.perf_counter()-t0)/reps*1e3:8.1f} ms/batch",
              flush=True)

    timed_transfer(pred_full, "full")
    timed_transfer(pred_u8, "u8")
    timed_transfer(pred_bits, "bits")


if __name__ == "__main__":
    main()
