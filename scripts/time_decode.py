"""Measure the SAM mask-decoder prompt-batched speedup (VERDICT r1 item 7).

Times the full decoder at predict scale (B=1, P=100 prompts, 64x64 image
embedding) two ways with identical parameters:
  old   — per-prompt dense embeddings (5-dim) -> prompts flatten into batch
          from the start (the round-1 behavior for every path)
  new   — shared dense embedding (4-dim) -> first two-way block runs with the
          image side un-broadcast (layer-1 image projections once per image)

Also checks the two agree numerically.

Run: python scripts/time_decode.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.models.sam.configs import sam_config
from rsprompter_tpu.models.sam.mask_decoder import SamMaskDecoder

B, P, T, H = 1, 100, 2, 64


def main():
    cfg = sam_config("base").mask_decoder_config
    model = SamMaskDecoder(config=cfg, dtype=jnp.bfloat16)
    c = cfg.hidden_size
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (B, H, H, c), jnp.bfloat16) * 0.1
    pe = jax.random.normal(jax.random.PRNGKey(1), (B, H, H, c), jnp.bfloat16) * 0.1
    sparse = jax.random.normal(jax.random.PRNGKey(2), (B, P, T, c), jnp.bfloat16) * 0.1
    dense = jax.random.normal(jax.random.PRNGKey(3), (B, H, H, c), jnp.bfloat16) * 0.1
    dense5 = jnp.broadcast_to(dense[:, None], (B, P, H, H, c))

    params = jax.jit(lambda: model.init(jax.random.PRNGKey(4), img, pe, sparse, dense))()

    @jax.jit
    def new(params):
        return model.apply(params, img, pe, sparse, dense, multimask_output=True)

    @jax.jit
    def old(params):
        return model.apply(params, img, pe, sparse, dense5, multimask_output=True)

    def timeit(fn):
        for _ in range(6):
            m, i = fn(params)
            np.asarray(i)[...]
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            m, i = fn(params)
            np.asarray(i)[...]
            np.asarray(m[..., :1, :1, :1])[...]
        return (time.perf_counter() - t0) / reps

    mn, inew = new(params)
    mo, iold = old(params)
    print("masks max|new-old| =", float(jnp.max(jnp.abs(mn.astype(jnp.float32) - mo.astype(jnp.float32)))),
          " iou max|new-old| =", float(jnp.max(jnp.abs(inew - iold))), flush=True)
    t_old = timeit(old)
    t_new = timeit(new)
    print(f"old (per-prompt flatten): {t_old * 1e3:7.1f} ms / {P} prompts", flush=True)
    print(f"new (shared first block): {t_new * 1e3:7.1f} ms / {P} prompts "
          f"({t_old / t_new:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
