"""Prototype variants of the WINDOW attention kernel (S=196, 200 windows).

Current production: per-window grid cell, 12 heads unrolled -> 4.0 ms.
Variants:
  cur          production fused_qkv_attention
  cellw4/8/25  W windows per grid cell (fewer cells, same math)
  xla_bcast    pure-XLA batched attention, bias via broadcast add (no E matmul)

Usage: python scripts/proto_win_attn.py [name ...]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf_probe2 import timeit, chain  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    _attend_one,
    _expansion_matrix,
    rel_factors,
    fused_qkv_attention,
)

B = 8
WIN = 14
S = WIN * WIN
HEADS = 12
HD = 64
NW = B * 25
LOG2E = 1.4426950408889634


def _mk_inputs():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, 3 * HEADS, S, HD), jnp.bfloat16) * 0.02
    rh = jax.random.normal(key, (2 * WIN - 1, HD), jnp.bfloat16) * 0.02
    return qkv, rh


def probe_cur():
    qkv, rh = _mk_inputs()

    def step(p, xx):
        return chain(xx, fused_qkv_attention(xx, rh, rh, (WIN, WIN)))

    return timeit(step, {}, qkv)


def _cell_kernel(qkv_ref, f_ref, e_ref, o_ref, *, scale, heads, wpc):
    e = e_ref[...]
    for wi in range(wpc):
        for n in range(heads):
            o_ref[wi, n] = _attend_one(
                qkv_ref[wi, n],
                qkv_ref[wi, heads + n],
                qkv_ref[wi, 2 * heads + n],
                f_ref[wi, n],
                e,
                scale,
                o_ref.dtype,
            )


def _probe_cellw(wpc):
    qkv, rh = _mk_inputs()
    scale = HD ** -0.5
    lmax = WIN

    def run(qkv):
        factors = rel_factors(qkv[:, :HEADS], rh, rh, (WIN, WIN))
        e = _expansion_matrix((WIN, WIN), qkv.dtype)
        kernel = functools.partial(_cell_kernel, scale=scale, heads=HEADS, wpc=wpc)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((NW, HEADS, S, HD), qkv.dtype),
            grid=(NW // wpc,),
            in_specs=[
                pl.BlockSpec((wpc, 3 * HEADS, S, HD), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((wpc, HEADS, S, 2 * lmax), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((2 * lmax, S), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((wpc, HEADS, S, HD), lambda i: (i, 0, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(qkv, factors, e)

    def step(p, xx):
        return chain(xx, run(xx))

    return timeit(step, {}, qkv)


def probe_cellw4():
    return _probe_cellw(4)


def probe_cellw8():
    return _probe_cellw(8)


def probe_cellw25():
    return _probe_cellw(25)


def probe_xla_bcast():
    qkv, rh = _mk_inputs()
    scale = HD ** -0.5

    def run(qkv):
        q, k, v = qkv[:, :HEADS], qkv[:, HEADS : 2 * HEADS], qkv[:, 2 * HEADS :]
        packed = rel_factors(q, rh, rh, (WIN, WIN))  # (NW, n, S, 2*14)
        relh = packed[..., :WIN]  # (NW, n, S, 14)
        relw = packed[..., WIN:]
        s = jnp.einsum("bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32)
        s = s * scale
        bias = relh[..., :, None] + relw[..., None, :]  # (NW, n, S, 14, 14)
        s = s + bias.reshape(NW, HEADS, S, S).astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bnqk,bnkd->bnqd", p, v)

    def step(p, xx):
        return chain(xx, run(xx))

    return timeit(step, {}, qkv)


def probe_check():
    """Numerical check: cellw8 vs production."""
    qkv, rh = _mk_inputs()
    ref = fused_qkv_attention(qkv, rh, rh, (WIN, WIN))

    factors = rel_factors(qkv[:, :HEADS], rh, rh, (WIN, WIN))
    e = _expansion_matrix((WIN, WIN), qkv.dtype)
    kernel = functools.partial(_cell_kernel, scale=HD ** -0.5, heads=HEADS, wpc=8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NW, HEADS, S, HD), qkv.dtype),
        grid=(NW // 8,),
        in_specs=[
            pl.BlockSpec((8, 3 * HEADS, S, HD), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((8, HEADS, S, 2 * WIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2 * WIN, S), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, HEADS, S, HD), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, factors, e)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"max |cellw8 - cur| = {err:.2e}")
    return 0.0


PROBES = {k[6:]: v for k, v in list(globals().items()) if k.startswith("probe_")}


def main():
    names = sys.argv[1:] or ["cur", "cellw4", "cellw8", "cellw25", "xla_bcast", "check"]
    for name in names:
        dt = PROBES[name]()
        if name != "check":
            print(f"{name:12s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
