"""Timing ablation: pair kernels with/without the *scale and *LOG2E VPU
passes (numerics-wrong, timing-only), plus bq sweep for the global pair
kernel. Uses the production _pair_fwd with monkeypatched _attend_one."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perf_probe2 import timeit, chain  # noqa: E402
import rsprompter_tpu.ops.fused_vit_attention as fva  # noqa: E402

B, GRID, HEADS, HD, WIN = 8, 64, 12, 64, 14
S = GRID * GRID
NW = B * 25


def _attend_noscale(q, k, v, f, e, scale, out_dtype):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + jax.lax.dot(f, e, preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m).astype(v.dtype)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    return (o / l).astype(out_dtype)


def run(kind, patch, bq=512):
    key = jax.random.PRNGKey(0)
    if kind == "g":
        qkv = jax.random.normal(key, (B, 3 * HEADS // 2, S, 2 * HD), jnp.bfloat16) * 0.05
        rh = jax.random.normal(key, (2 * GRID - 1, HD), jnp.bfloat16) * 0.05
        hw = (GRID, GRID)
    else:
        qkv = jax.random.normal(key, (NW, 3 * HEADS // 2, WIN * WIN, 2 * HD), jnp.bfloat16) * 0.05
        rh = jax.random.normal(key, (2 * WIN - 1, HD), jnp.bfloat16) * 0.05
        hw = (WIN, WIN)
    orig = fva._attend_one
    if patch:
        fva._attend_one = _attend_noscale
    try:
        def step(p, xx):
            return chain(xx, fva._pair_fwd(xx, rh, rh, hw, block_q=bq))
        dt = timeit(step, {}, qkv)
    finally:
        fva._attend_one = orig
    return dt


if __name__ == "__main__":
    for kind in ("g", "w"):
        for patch in (False, True):
            dt = run(kind, patch)
            print(f"{kind} noscale={patch}  {dt*1e3:8.3f} ms", flush=True)
    for bq in (256, 1024, 2048):
        dt = run("g", False, bq=bq)
        print(f"g bq={bq}  {dt*1e3:8.3f} ms", flush=True)
