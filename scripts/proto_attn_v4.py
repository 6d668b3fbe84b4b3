"""Global-attention v4 prototype: kill the separate bias-expansion matmul.

Current kernel per half: scores = q@k^T (K=64, half-empty MXU pass)
                                  + f@E  (K=128 dense, 2x the QK FLOPs).
v4: scores = [q*scale | rel_h] @ [k | Eh]^T   (ONE dense K=128 pass)
            + lane-tiled rel_w add            (pltpu.repeat, VPU, hides under MXU)

FLOPs/head: 2.1G (QK) + 4.3G (bias) + 2.1G (PV) -> 4.3G (fused QK+bias_h) + 2.1G.
rel_w must be in NATURAL kc order (the tile has no expansion matrix to absorb
the flip): flip the flipped factor slice at trace time (cheap XLA reverse).

Run: python scripts/proto_attn_v4.py [check|time]
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

from perf_probe2 import timeit, chain, B  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    _expansion_matrix,
    _pair_fwd,
    rel_factors_pair,
)

GRID = 64
S = GRID * GRID
NP = 6  # head pairs (ViT-B: 12 heads)
D = 64


def _eh_matrix(h: int, w: int, dtype) -> jax.Array:
    """(S, h) one-hot: Eh[k, j] = 1 iff row(k) == h-1-j (flipped-j, matching
    the rel_factors_pair column order)."""
    rows = jnp.repeat(jnp.arange(h), w)  # row(k)
    return (rows[:, None] == (h - 1 - jnp.arange(h))[None, :]).astype(dtype)


def _kernel_v4(q_ref, k_ref, v_ref, f_ref, eh_ref, o_ref, *, scale, d, lmax):
    eh = eh_ref[...]  # (S, L)
    qp = q_ref[0, 0]
    kp = k_ref[0, 0]
    vp = v_ref[0, 0]
    fp = f_ref[0, 0]  # (bq, 4L): [h_a | w_a(nat) | h_b | w_b(nat)]
    outs = []
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        fh = fp[:, half * 2 * lmax : half * 2 * lmax + lmax]
        fw = fp[:, half * 2 * lmax + lmax : (half + 1) * 2 * lmax]
        qhat = jnp.concatenate([qp[:, sl] * scale, fh], axis=-1)  # (bq, d+L)
        khat = jnp.concatenate([kp[:, sl], eh], axis=-1)  # (S, d+L)
        sc = jax.lax.dot_general(
            qhat, khat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = sc + pltpu.repeat(fw, S // lmax, axis=1).astype(jnp.float32)
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp2((sc - m) * 1.4426950408889634).astype(vp.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot(p, vp[:, sl], preferred_element_type=jnp.float32)
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0, 0] = jnp.concatenate(outs, axis=-1)


def fwd_v4(qkv_pair, rel_pos_h, rel_pos_w, hw, block_q=512):
    h, w = hw
    b, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    d = d2 // 2
    lmax = max(h, w)
    scale = d ** -0.5

    f = rel_factors_pair(qkv_pair[:, :np_], rel_pos_h, rel_pos_w, hw)
    # un-flip the w slices to natural kc order (trace-time reverse)
    fh_a = f[..., :lmax]
    fw_a = f[..., lmax : 2 * lmax][..., ::-1]
    fh_b = f[..., 2 * lmax : 3 * lmax]
    fw_b = f[..., 3 * lmax :][..., ::-1]
    f = jnp.concatenate([fh_a, fw_a, fh_b, fw_b], axis=-1)
    eh = _eh_matrix(h, w, qkv_pair.dtype)

    bq = block_q
    while s % bq:
        bq //= 2
    kernel = functools.partial(_kernel_v4, scale=scale, d=d, lmax=lmax)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, s, d2), qkv_pair.dtype),
        grid=(b, np_, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d2), lambda b_, p, i: (b_, p, i, 0)),
            pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, np_ + p, 0, 0)),
            pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, 2 * np_ + p, 0, 0)),
            pl.BlockSpec((1, 1, bq, 4 * lmax), lambda b_, p, i: (b_, p, i, 0)),
            pl.BlockSpec((s, lmax), lambda b_, p, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d2), lambda b_, p, i: (b_, p, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv_pair, qkv_pair, qkv_pair, f, eh)


def check():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (2, 3 * NP, S, 2 * D), jnp.bfloat16) * 0.3
    th = jax.random.normal(jax.random.PRNGKey(1), (2 * GRID - 1, D), jnp.bfloat16) * 0.2
    tw = jax.random.normal(jax.random.PRNGKey(2), (2 * GRID - 1, D), jnp.bfloat16) * 0.2
    ref = _pair_fwd(qkv, th, tw, (GRID, GRID))
    new = fwd_v4(qkv, th, tw, (GRID, GRID))
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)))
    print("max |ref - v4| =", float(err), flush=True)


def time_both():
    qkv = jnp.zeros((B, 3 * NP, S, 2 * D), jnp.bfloat16)
    th = jnp.zeros((2 * GRID - 1, D), jnp.bfloat16)
    tw = jnp.zeros((2 * GRID - 1, D), jnp.bfloat16)

    def mk(fn):
        def step(p, xx):
            out = fn(xx, th, tw, (GRID, GRID))
            return chain(xx, out)

        return step

    for name, fn in (("current", _pair_fwd), ("v4", fwd_v4)):
        dt = timeit(mk(fn), {}, qkv)
        print(f"{name:8s} {dt * 1e3:8.2f} ms  (4 layers would be {4 * dt * 1e3:.1f})",
              flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["check", "time"]:
        {"check": check, "time": time_both}[arg]()
