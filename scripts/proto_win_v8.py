"""Window attention v8: G windows per grid cell (launch-overhead attack).

Round-2 finding: the per-window kernel runs 200 tiny cells/layer @bs8 and is
latency-bound (~2.2 ms vs ~0.2 ms FLOP floor). The windows already sit on the
LEADING dim of qkv_pair, so grouping G of them per cell is a free reshape —
no layout change, same minimal 196^2 softmax element count, 200/G cells.

Variants: current (G=1 per-window), g5, g10, g20 — all with RANDOM inputs
(docs/design.md timing rule).

Run: python scripts/proto_win_v8.py [check|time]
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
    _attend_one,
    _pair_expansions,
    _pair_fwd,
    rel_factors_pair,
)

WIN = 14
S = WIN * WIN
NW = 25 * B  # 200 windows @bs8
NP = 6
D = 64


def _grouped_kernel(qkv_ref, f_ref, ea_ref, eb_ref, o_ref, *, scale, pairs, d, group):
    ea = ea_ref[...]
    eb = eb_ref[...]
    for g in range(group):
        for n in range(pairs):
            qp = qkv_ref[0, g, n]
            kp = qkv_ref[0, g, pairs + n]
            vp = qkv_ref[0, g, 2 * pairs + n]
            f = f_ref[0, g, n]
            outs = []
            for half, e in ((0, ea), (1, eb)):
                sl = slice(half * d, (half + 1) * d)
                outs.append(
                    _attend_one(
                        qp[:, sl], kp[:, sl], vp[:, sl], f, e, scale,
                        o_ref.dtype,
                    )
                )
            o_ref[0, g, n] = jnp.concatenate(outs, axis=-1)


def fwd_grouped(qkv_pair, rel_pos_h, rel_pos_w, hw, group):
    h, w = hw
    bw, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    d = d2 // 2
    lmax = max(h, w)
    scale = d ** -0.5
    factors = rel_factors_pair(qkv_pair[:, :np_], rel_pos_h, rel_pos_w, hw)
    e_a, e_b = _pair_expansions(hw, qkv_pair.dtype)
    kernel = functools.partial(
        _grouped_kernel, scale=scale, pairs=np_, d=d, group=group
    )
    qkv_g = qkv_pair.reshape(bw // group, group, n3p, s, d2)
    f_g = factors.reshape(bw // group, group, np_, s, 4 * lmax)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bw // group, group, np_, s, d2), qkv_pair.dtype),
        grid=(bw // group,),
        in_specs=[
            pl.BlockSpec((1, group, n3p, s, d2), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, group, np_, s, 4 * lmax), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((4 * lmax, s), lambda i: (0, 0)),
            pl.BlockSpec((4 * lmax, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, group, np_, s, d2), lambda i: (i, 0, 0, 0, 0)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv_g, f_g, e_a, e_b)
    return out.reshape(bw, np_, s, d2)


def check():
    qkv = jax.random.normal(
        jax.random.PRNGKey(0), (20, 3 * NP, S, 2 * D), jnp.bfloat16
    ) * 0.3
    th = jax.random.normal(jax.random.PRNGKey(1), (2 * WIN - 1, D), jnp.bfloat16) * 0.2
    tw = jax.random.normal(jax.random.PRNGKey(2), (2 * WIN - 1, D), jnp.bfloat16) * 0.2
    ref = _pair_fwd(qkv, th, tw, (WIN, WIN))
    for g in (5, 10, 20):
        new = fwd_grouped(qkv, th, tw, (WIN, WIN), g)
        err = jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)))
        print(f"g{g}: max |ref - v8| = {float(err)}", flush=True)


def time_all():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, 3 * NP, S, 2 * D), jnp.bfloat16) * 0.3
    th = jax.random.normal(jax.random.PRNGKey(1), (2 * WIN - 1, D), jnp.bfloat16) * 0.2
    tw = jax.random.normal(jax.random.PRNGKey(2), (2 * WIN - 1, D), jnp.bfloat16) * 0.2

    dt = timeit(lambda p, xx: chain(xx, _pair_fwd(xx, th, tw, (WIN, WIN))), {}, qkv)
    print(f"current   {dt * 1e3:8.3f} ms/layer-attn", flush=True)
    for g in (5, 10, 20):
        dt = timeit(
            lambda p, xx: chain(xx, fwd_grouped(xx, th, tw, (WIN, WIN), g)), {}, qkv
        )
        print(f"g{g:<8d} {dt * 1e3:8.3f} ms/layer-attn", flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["check", "time"]:
        {"check": check, "time": time_all}[arg]()
