"""Ablation timing of the global/window attention kernels: which op dominates?

Each variant removes ONE piece (numerics intentionally wrong — timing only):
  full       QK + biasE + softmax + PV   (production math)
  nobias     QK + softmax + PV
  nosm       QK + biasE + PV (softmax -> *1e-4)
  mmonly     QK + PV only
  nomax      QK + biasE + exp2(s) (no max subtraction) + sum + PV

Usage: python scripts/proto_ablate.py [g w] [variants...]
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
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    _expansion_matrix,
    rel_factors,
)

B, GRID, HEADS, HD, WIN = 8, 64, 12, 64, 14
S = GRID * GRID
SW = WIN * WIN
NW = B * 25
LOG2E = 1.4426950408889634

VARIANTS = ("full", "nobias", "nosm", "mmonly", "nomax", "smax", "bmax")


def _attend(q, k, v, f, e, scale, out_dtype, variant):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if variant not in ("nobias", "mmonly"):
        s = s + jax.lax.dot(f, e, preferred_element_type=jnp.float32)
    if variant in ("nosm", "mmonly"):
        p = (s * 1e-4).astype(v.dtype)
    elif variant == "nomax":
        p = jnp.exp2(s * LOG2E - 30.0).astype(v.dtype)
    elif variant == "smax":
        m = jnp.max(s)  # scalar max over the whole block
        p = jnp.exp2((s - m) * LOG2E).astype(v.dtype)
    elif variant == "bmax":
        # per-row max via MXU-free two-step: max over 128-lane chunks then
        # a tiny second reduce; still per-row exact
        m = jnp.max(s.reshape(s.shape[0], -1, 128), axis=1)
        m = jnp.max(m, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * LOG2E).astype(v.dtype)
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * LOG2E).astype(v.dtype)
    if variant in ("nosm", "mmonly"):
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        return o.astype(out_dtype)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    return (o / l).astype(out_dtype)


def _g_kernel(q_ref, k_ref, v_ref, f_ref, e_ref, o_ref, *, scale, variant):
    e = e_ref[...]
    for j in range(2):
        o_ref[0, 0, j] = _attend(
            q_ref[0, 0, j], k_ref[0, 0, j], v_ref[0, 0, j], f_ref[0, 0, j],
            e, scale, o_ref.dtype, variant,
        )


def g_run(qkv, rh, variant, bq=512):
    b, n3, s, d = qkv.shape
    n = n3 // 3
    lmax = GRID
    factors = rel_factors(qkv[:, :n], rh, rh, (GRID, GRID))
    e = _expansion_matrix((GRID, GRID), qkv.dtype)
    hp = n // 2
    q_p = qkv[:, :n].reshape(b, hp, 2, s, d)
    k_p = qkv[:, n : 2 * n].reshape(b, hp, 2, s, d)
    v_p = qkv[:, 2 * n :].reshape(b, hp, 2, s, d)
    fac_p = factors.reshape(b, hp, 2, s, 2 * lmax)
    kernel = functools.partial(_g_kernel, scale=d ** -0.5, variant=variant)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, 2, s, d), qkv.dtype),
        grid=(b, hp, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, 2, bq, d), lambda b_, p, i: (b_, p, 0, i, 0)),
            pl.BlockSpec((1, 1, 2, s, d), lambda b_, p, i: (b_, p, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, s, d), lambda b_, p, i: (b_, p, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, bq, 2 * lmax), lambda b_, p, i: (b_, p, 0, i, 0)),
            pl.BlockSpec((2 * lmax, s), lambda b_, p, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, bq, d), lambda b_, p, i: (b_, p, 0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q_p, k_p, v_p, fac_p, e)
    return out.reshape(b, n, s, d)


def _w_kernel(qkv_ref, f_ref, e_ref, o_ref, *, scale, heads, variant):
    e = e_ref[...]
    for nh in range(heads):
        o_ref[0, nh] = _attend(
            qkv_ref[0, nh], qkv_ref[0, heads + nh], qkv_ref[0, 2 * heads + nh],
            f_ref[0, nh], e, scale, o_ref.dtype, variant,
        )


def w_run(qkv, rh, variant):
    nw, n3, s, d = qkv.shape
    n = n3 // 3
    factors = rel_factors(qkv[:, :n], rh, rh, (WIN, WIN))
    e = _expansion_matrix((WIN, WIN), qkv.dtype)
    kernel = functools.partial(_w_kernel, scale=d ** -0.5, heads=n, variant=variant)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw, n, s, d), qkv.dtype),
        grid=(nw,),
        in_specs=[
            pl.BlockSpec((1, n3, s, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, s, 2 * WIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2 * WIN, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, s, d), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, factors, e)


def main():
    kinds = [a for a in sys.argv[1:] if a in ("g", "w")] or ["g", "w"]
    variants = [a for a in sys.argv[1:] if a in VARIANTS] or list(VARIANTS)
    key = jax.random.PRNGKey(0)
    if "g" in kinds:
        qkv = jax.random.normal(key, (B, 3 * HEADS, S, HD), jnp.bfloat16) * 0.05
        rh = jax.random.normal(key, (2 * GRID - 1, HD), jnp.bfloat16) * 0.05
        for v in variants:
            def step(p, xx, v=v):
                return chain(xx, g_run(xx, rh, v))
            dt = timeit(step, {}, qkv)
            print(f"g_{v:8s} {dt * 1e3:8.3f} ms", flush=True)
    if "w" in kinds:
        qkv = jax.random.normal(key, (NW, 3 * HEADS, SW, HD), jnp.bfloat16) * 0.05
        rh = jax.random.normal(key, (2 * WIN - 1, HD), jnp.bfloat16) * 0.05
        for v in variants:
            def step(p, xx, v=v):
                return chain(xx, w_run(xx, rh, v))
            dt = timeit(step, {}, qkv)
            print(f"w_{v:8s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
