"""Global-kernel DMA floor: copy kernel over the production block structure
vs a lane-dense pair-packed structure. Also relfac global einsum cost now.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf_probe2 import timeit, chain  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import rel_factors, rel_factors_pair  # noqa: E402

B, GRID, HEADS, HD = 8, 64, 12, 64
S = GRID * GRID
BQ = 512


def probe_copy_prod():
    """Copy with production global blocks: (1,1,2,bq,64) q/f/out, (1,1,2,s,64) k/v."""
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, 3 * HEADS, S, HD), jnp.bfloat16) * 0.05
    hp = HEADS // 2

    def kern(q_ref, k_ref, v_ref, f_ref, o_ref):
        for j in range(2):
            o_ref[0, 0, j] = q_ref[0, 0, j] + v_ref[0, 0, j][:BQ]

    def step(p, xx):
        q_p = xx[:, :HEADS].reshape(B, hp, 2, S, HD)
        k_p = xx[:, HEADS:2 * HEADS].reshape(B, hp, 2, S, HD)
        v_p = xx[:, 2 * HEADS:].reshape(B, hp, 2, S, HD)
        fac = jnp.zeros((B, hp, 2, S, 2 * GRID), xx.dtype)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, hp, 2, S, HD), xx.dtype),
            grid=(B, hp, S // BQ),
            in_specs=[
                pl.BlockSpec((1, 1, 2, BQ, HD), lambda b_, p_, i: (b_, p_, 0, i, 0)),
                pl.BlockSpec((1, 1, 2, S, HD), lambda b_, p_, i: (b_, p_, 0, 0, 0)),
                pl.BlockSpec((1, 1, 2, S, HD), lambda b_, p_, i: (b_, p_, 0, 0, 0)),
                pl.BlockSpec((1, 1, 2, BQ, 2 * GRID), lambda b_, p_, i: (b_, p_, 0, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 2, BQ, HD), lambda b_, p_, i: (b_, p_, 0, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q_p, k_p, v_p, fac)
        return chain(xx, out)

    return timeit(step, {}, qkv)


def probe_copy_pair():
    """Copy with pair-packed global blocks: (1,1,bq,128) q/out, (1,1,s,128) k/v,
    f (1,1,bq,256)."""
    key = jax.random.PRNGKey(0)
    hp = HEADS // 2
    qkv = jax.random.normal(key, (B, 3 * hp, S, 2 * HD), jnp.bfloat16) * 0.05

    def kern(q_ref, k_ref, v_ref, f_ref, o_ref):
        o_ref[0, 0] = q_ref[0, 0] + v_ref[0, 0][:BQ]

    def step(p, xx):
        fac = jnp.zeros((B, hp, S, 4 * GRID), xx.dtype)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, hp, S, 2 * HD), xx.dtype),
            grid=(B, hp, S // BQ),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, 2 * HD), lambda b_, p_, i: (b_, p_, i, 0)),
                pl.BlockSpec((1, 1, S, 2 * HD), lambda b_, p_, i: (b_, hp + p_, 0, 0)),
                pl.BlockSpec((1, 1, S, 2 * HD), lambda b_, p_, i: (b_, 2 * hp + p_, 0, 0)),
                pl.BlockSpec((1, 1, BQ, 4 * GRID), lambda b_, p_, i: (b_, p_, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, BQ, 2 * HD), lambda b_, p_, i: (b_, p_, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xx, xx, xx, fac)
        return chain(xx, out)

    return timeit(step, {}, qkv)


def probe_relfac_g():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, HEADS, S, HD), jnp.bfloat16) * 0.05
    rh = jax.random.normal(key, (2 * GRID - 1, HD), jnp.bfloat16) * 0.05

    def step(p, xx):
        return chain(xx, rel_factors(xx, rh, rh, (GRID, GRID)))

    return timeit(step, {}, q)


def probe_relfac_g_pair():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, HEADS // 2, S, 2 * HD), jnp.bfloat16) * 0.05
    rh = jax.random.normal(key, (2 * GRID - 1, HD), jnp.bfloat16) * 0.05

    def step(p, xx):
        return chain(xx, rel_factors_pair(xx, rh, rh, (GRID, GRID)))

    return timeit(step, {}, q)


PROBES = {k[6:]: v for k, v in list(globals().items()) if k.startswith("probe_")}

if __name__ == "__main__":
    for name in sys.argv[1:] or list(PROBES):
        dt = PROBES[name]()
        print(f"{name:16s} {dt * 1e3:8.3f} ms", flush=True)
