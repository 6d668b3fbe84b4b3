"""Window attention v6: STRIP kernel — one dense masked attend per 14x70 row
strip (5 windows / 980 tokens), bias AND window mask folded into the K dim.

scores = [q*scale | fh(14) | fw(14) | sqrtB*ow(5) | 1 | 0pad] @
         [k       | Eh     | Ew     | sqrtB*ow    | -B| 0pad]^T
K = 64 + 64 = 128 — exactly one dense K tile; off-window pairs get -B -> exp 0.

Eliminates: 200 tiny window cells (-> 40 strip cells of dense 980x128x980
matmuls), the separate f@E bias matmul, the bias add pass, AND the
window_partition/unpartition shuffles (strips are contiguous rows of the
padded (70,70) grid).

Run: python scripts/proto_win_v6.py [check|time]
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
    _pair_fwd,
    _resize_table,
)

WIN = 14
NSTRIP = 5  # strips per image (70 / 14)
WP = WIN * NSTRIP  # 70 padded grid
ST = WIN * WP  # 980 tokens per strip
NP = 6
D = 64
LOG2E = 1.4426950408889634
BIG = 1.0e5
SQRTB = BIG ** 0.5


def _khat_static(dtype) -> jax.Array:
    """(ST, 64): [Eh(14) | Ew(14) | sqrtB*ow(5) | -B | 0*30] for one strip.
    Token t = r*70 + c: r=t//70 (within-window row), c%14 within-window col,
    c//14 window id. Eh/Ew one-hot FLIPPED (13-j) to match factor layout."""
    t = jnp.arange(ST)
    r = t // WP
    c = t % WP
    j = jnp.arange(WIN)
    eh = (r[:, None] == (WIN - 1 - j)[None, :])
    ew = ((c % WIN)[:, None] == (WIN - 1 - j)[None, :])
    ow = (c // WIN)[:, None] == jnp.arange(NSTRIP)[None, :]
    parts = [
        eh.astype(jnp.float32),
        ew.astype(jnp.float32),
        ow.astype(jnp.float32) * SQRTB,
        jnp.full((ST, 1), -BIG / SQRTB, jnp.float32),
        jnp.zeros((ST, 64 - 2 * WIN - NSTRIP - 1), jnp.float32),
    ]
    return jnp.concatenate(parts, axis=1).astype(dtype)


def _qstat() -> jax.Array:
    """(ST, 36 - 2*WIN... ) static part of qhat factors: [sqrtB*ow | sqrtB]."""
    t = jnp.arange(ST)
    c = t % WP
    ow = ((c // WIN)[:, None] == jnp.arange(NSTRIP)[None, :]).astype(jnp.float32)
    return jnp.concatenate([ow * SQRTB, jnp.full((ST, 1), SQRTB, jnp.float32)], axis=1)


def rel_factors_strip(q_pair, rel_pos_h, rel_pos_w, dtype=None):
    """q_pair: (B, np, S=NSTRIP*ST, 128) strip-flattened padded grid.
    Returns (B, np, S, 128): per half [fh(14)|fw(14)|sqrtB*ow(5)|sqrtB(1)|0*30].
    fh[q,j] = q . Th[r(q)+j]  (flipped-j staircase, same as rel_factors_pair)."""
    b, np_, s, d2 = q_pair.shape
    d = d2 // 2
    th = _resize_table(rel_pos_h, 2 * WIN - 1).astype(q_pair.dtype)
    tw = _resize_table(rel_pos_w, 2 * WIN - 1).astype(q_pair.dtype)
    idx = jnp.arange(WIN)[:, None] + jnp.arange(WIN)[None, :]  # (r, j) -> r+j
    th_g = th[idx]  # (14, 14, d)
    tw_g = tw[idx]

    # strip layout: (b*np, NSTRIP, WIN(r), NSTRIP(w), WIN(m), d2)
    qg = q_pair.reshape(b * np_, NSTRIP, WIN, NSTRIP, WIN, d2)
    # fh: grouped by r; block-diag tables per lane half
    def blockdiag(tab):
        """(g, j, d) -> (g, 28pad?, 2d) NO — emit per-half below instead."""
        return tab

    fh_a = jnp.einsum("bsrwmc,rjc->bsrwmj", qg[..., :d], th_g)
    fw_a = jnp.einsum("bsrwmc,mjc->bsrwmj", qg[..., :d], tw_g)
    fh_b = jnp.einsum("bsrwmc,rjc->bsrwmj", qg[..., d:], th_g)
    fw_b = jnp.einsum("bsrwmc,mjc->bsrwmj", qg[..., d:], tw_g)

    stat = jnp.broadcast_to(
        jnp.tile(_qstat().astype(q_pair.dtype), (NSTRIP, 1)).reshape(
            1, NSTRIP, WIN, NSTRIP, WIN, NSTRIP + 1
        ),
        (b * np_, NSTRIP, WIN, NSTRIP, WIN, NSTRIP + 1),
    )
    zpad = jnp.zeros(fh_a.shape[:-1] + (64 - 2 * WIN - NSTRIP - 1,), q_pair.dtype)
    f = jnp.concatenate(
        [fh_a, fw_a, stat, zpad, fh_b, fw_b, stat, zpad], axis=-1
    )
    return f.reshape(b, np_, s, 2 * 64)


def _strip_kernel(qkv_ref, f_ref, es_ref, o_ref, *, scale, pairs, d):
    es = es_ref[...]  # (ST, 64)
    c = jnp.asarray(scale, qkv_ref.dtype)
    for n in range(pairs):
        qp = qkv_ref[0, n, 0]
        kp = qkv_ref[0, pairs + n, 0]
        vp = qkv_ref[0, 2 * pairs + n, 0]
        f = f_ref[0, n, 0]  # (ST, 128)
        outs = []
        for half in range(2):
            sl = slice(half * d, (half + 1) * d)
            qhat = jnp.concatenate([qp[:, sl] * c, f[:, half * 64 : (half + 1) * 64]], axis=-1)
            khat = jnp.concatenate([kp[:, sl], es], axis=-1)
            sc = jax.lax.dot_general(
                qhat, khat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2((sc - m) * LOG2E).astype(vp.dtype)
            norm = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot(p, vp[:, sl], preferred_element_type=jnp.float32)
            outs.append((o / norm).astype(o_ref.dtype))
        o_ref[0, n, 0] = jnp.concatenate(outs, axis=-1)


def fwd_v6(qkv_pair_strips, rel_pos_h, rel_pos_w):
    """qkv_pair_strips: (B, 3np, NSTRIP*ST, 128) — padded-grid row-major
    flatten (strips are contiguous)."""
    b, n3p, s, d2 = qkv_pair_strips.shape
    np_ = n3p // 3
    d = d2 // 2
    scale = d ** -0.5
    f = rel_factors_strip(qkv_pair_strips[:, :np_], rel_pos_h, rel_pos_w)
    es = _khat_static(qkv_pair_strips.dtype)
    kernel = functools.partial(_strip_kernel, scale=scale, pairs=np_, d=d)
    qkv5 = qkv_pair_strips.reshape(b, n3p, NSTRIP, ST, d2)
    f5 = f.reshape(b, np_, NSTRIP, ST, 2 * 64)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, NSTRIP, ST, d2), qkv_pair_strips.dtype),
        grid=(b, NSTRIP),
        in_specs=[
            pl.BlockSpec((1, n3p, 1, ST, d2), lambda b_, i: (b_, 0, i, 0, 0)),
            pl.BlockSpec((1, np_, 1, ST, 2 * 64), lambda b_, i: (b_, 0, i, 0, 0)),
            pl.BlockSpec((ST, 64), lambda b_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, np_, 1, ST, d2), lambda b_, i: (b_, 0, i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv5, f5, es)
    return out.reshape(b, np_, s, d2)


def _windows_to_strips(qkv_win):
    """(B*25, 3np, 196, 128) -> (B, 3np, 4900, 128) strip-major row flatten."""
    bw, n3p, s, d2 = qkv_win.shape
    b = bw // (NSTRIP * NSTRIP)
    x = qkv_win.reshape(b, NSTRIP, NSTRIP, n3p, WIN, WIN, d2)
    # (b, si, wj, n, r, m, d) -> (b, n, si, r, wj, m, d)
    x = x.transpose(0, 3, 1, 4, 2, 5, 6)
    return x.reshape(b, n3p, NSTRIP * ST, d2)


def _strips_to_windows(out_strips):
    b, np_, s, d2 = out_strips.shape
    x = out_strips.reshape(b, np_, NSTRIP, WIN, NSTRIP, WIN, d2)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)
    return x.reshape(b * NSTRIP * NSTRIP, np_, WIN * WIN, d2)


def check():
    bw = 2 * NSTRIP * NSTRIP
    qkv = jax.random.normal(jax.random.PRNGKey(0), (bw, 3 * NP, WIN * WIN, 2 * D), jnp.bfloat16) * 0.3
    th = jax.random.normal(jax.random.PRNGKey(1), (2 * WIN - 1, D), jnp.bfloat16) * 0.2
    tw = jax.random.normal(jax.random.PRNGKey(2), (2 * WIN - 1, D), jnp.bfloat16) * 0.2
    ref = _pair_fwd(qkv, th, tw, (WIN, WIN))
    new = _strips_to_windows(fwd_v6(_windows_to_strips(qkv), th, tw))
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)))
    print("max |ref - v6| =", float(err), flush=True)


def time_all():
    qkv_w = jnp.zeros((B * 25, 3 * NP, WIN * WIN, 2 * D), jnp.bfloat16)
    qkv_s = jnp.zeros((B, 3 * NP, NSTRIP * ST, 2 * D), jnp.bfloat16)
    th = jnp.zeros((2 * WIN - 1, D), jnp.bfloat16)
    tw = jnp.zeros((2 * WIN - 1, D), jnp.bfloat16)

    dt = timeit(lambda p, xx: chain(xx, _pair_fwd(xx, th, tw, (WIN, WIN))), {}, qkv_w)
    print(f"current  {dt * 1e3:8.3f} ms/layer-attn", flush=True)
    dt = timeit(lambda p, xx: chain(xx, fwd_v6(xx, th, tw)), {}, qkv_s)
    print(f"v6-strip {dt * 1e3:8.3f} ms/layer-attn", flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["check", "time"]:
        {"check": check, "time": time_all}[arg]()
