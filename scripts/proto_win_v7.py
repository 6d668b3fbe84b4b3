"""Which part of the window pair-kernel costs: MXU dots vs softmax VPU?

Variants of the current per-window kernel body:
  full      — as committed (dot + f@E + max/exp/sum/div + PV)
  nosmax    — skip max/exp/sum/div: p = sc cast to bf16 (keeps all dots)
  nobias    — skip the f@E dot (keeps softmax)
  dotsonly  — QK and PV only
  noreduce  — exp but no max/sum reductions (tests reduction cost vs exp cost)

Run: python scripts/proto_win_v7.py [variants...]
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

from perf_probe2 import timeit, chain, B  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    _pair_expansions,
    rel_factors_pair,
)

WIN = 14
S = WIN * WIN
NW = 200
NP = 6
D = 64
LOG2E = 1.4426950408889634


def _kernel(qkv_ref, f_ref, ea_ref, eb_ref, o_ref, *, scale, pairs, d, mode):
    ea = ea_ref[...]
    eb = eb_ref[...]
    for n in range(pairs):
        qp = qkv_ref[0, n]
        kp = qkv_ref[0, pairs + n]
        vp = qkv_ref[0, 2 * pairs + n]
        f = f_ref[0, n]
        outs = []
        for half, e in ((0, ea), (1, eb)):
            sl = slice(half * d, (half + 1) * d)
            sc = jax.lax.dot_general(
                qp[:, sl], kp[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if mode not in ("nobias",):
                if mode != "dotsonly":
                    sc = sc + jax.lax.dot(f, e, preferred_element_type=jnp.float32)
            if mode in ("nosmax", "dotsonly"):
                p = sc.astype(vp.dtype)
                o = jax.lax.dot(p, vp[:, sl], preferred_element_type=jnp.float32)
                outs.append(o.astype(o_ref.dtype))
            elif mode == "noreduce":
                p = jnp.exp2(sc * LOG2E).astype(vp.dtype)
                o = jax.lax.dot(p, vp[:, sl], preferred_element_type=jnp.float32)
                outs.append(o.astype(o_ref.dtype))
            else:
                m = jnp.max(sc, axis=-1, keepdims=True)
                p = jnp.exp2((sc - m) * LOG2E).astype(vp.dtype)
                l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
                o = jax.lax.dot(p, vp[:, sl], preferred_element_type=jnp.float32)
                outs.append((o / l).astype(o_ref.dtype))
        o_ref[0, n] = jnp.concatenate(outs, axis=-1)


def fwd(qkv_pair, rel_pos_h, rel_pos_w, hw, mode):
    h, w = hw
    b, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    d = d2 // 2
    lmax = max(h, w)
    scale = d ** -0.5
    factors = rel_factors_pair(qkv_pair[:, :np_], rel_pos_h, rel_pos_w, hw)
    e_a, e_b = _pair_expansions(hw, qkv_pair.dtype)
    kernel = functools.partial(_kernel, scale=scale, pairs=np_, d=d, mode=mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, s, d2), qkv_pair.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n3p, s, d2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, np_, s, 4 * lmax), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((4 * lmax, s), lambda i: (0, 0)),
            pl.BlockSpec((4 * lmax, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, np_, s, d2), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv_pair, factors, e_a, e_b)


def main(modes):
    qkv = jnp.zeros((NW, 3 * NP, S, 2 * D), jnp.bfloat16)
    th = jnp.zeros((2 * WIN - 1, D), jnp.bfloat16)
    tw = jnp.zeros((2 * WIN - 1, D), jnp.bfloat16)
    for mode in modes:
        dt = timeit(lambda p, xx: chain(xx, fwd(xx, th, tw, (WIN, WIN), mode)), {}, qkv)
        print(f"{mode:10s} {dt * 1e3:8.3f} ms/layer-attn", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["full", "nosmax", "nobias", "dotsonly", "noreduce"])
