"""Prototype v2 ViT attention kernels — benchmark vs current implementation.

Global v2: grid (B, heads, q_blocks); q/k/v sliced straight out of the packed
qkv (B, S, 3C) tensor by BlockSpec index maps (no XLA-side head transposes);
rel-pos bias via ONE K=128 expansion matmul from packed [rel_h|rel_w] factors.
Output written per-head into (B, S, C) columns — proj consumes it directly.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, GRID, C, HEADS, HD, WIN = 8, 64, 768, 12, 64, 14
S = GRID * GRID


def slope_time(make_prog, args, n_lo=2, n_hi=6, reps=3):
    lo, hi = make_prog(n_lo), make_prog(n_hi)

    def run(f):
        return float(np.asarray(f(*args)))

    for _ in range(3):
        run(lo)
        run(hi)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); run(lo); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); run(hi); t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (n_hi - n_lo))
    return min(ts)


# ---------------- global flash v2 ----------------

def _fwd_kernel_v2(qkv_q, qkv_k, qkv_v, rhw_ref, e_ref, o_ref, *, scale):
    q = qkv_q[0]            # (block_q, d)
    k = qkv_k[0]            # (S, d)
    v = qkv_v[0]            # (S, d)
    rhw = rhw_ref[0]        # (block_q, H+W)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + jax.lax.dot(rhw, e_ref[...], preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(v.dtype)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def flash_v2(qkv, rel_hw, hw, block_q=256):
    """qkv: (B, S, 3C); rel_hw: (B*heads, S, H+W) packed factors."""
    h, w = hw
    b, s, _ = qkv.shape
    rows = jnp.repeat(jnp.arange(h), w)
    cols = jnp.tile(jnp.arange(w), h)
    eh = (rows[None, :] == jnp.arange(h)[:, None]).astype(qkv.dtype)
    ew = (cols[None, :] == jnp.arange(w)[:, None]).astype(qkv.dtype)
    e = jnp.concatenate([eh, ew], axis=0)  # (H+W, S)
    scale = HD ** -0.5
    grid = (b, HEADS, s // block_q)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v2, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, s, C), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b_, h_, i: (b_, i, h_)),
            pl.BlockSpec((1, s, HD), lambda b_, h_, i: (b_, 0, HEADS + h_)),
            pl.BlockSpec((1, s, HD), lambda b_, h_, i: (b_, 0, 2 * HEADS + h_)),
            pl.BlockSpec(
                (1, block_q, h + w), lambda b_, h_, i: (b_ * HEADS + h_, i, 0)
            ),
            pl.BlockSpec((h + w, s), lambda b_, h_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, HD), lambda b_, h_, i: (b_, i, h_)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(qkv, qkv, qkv, rel_hw, e)


def rel_factors_packed(qkv, rh_tab, rw_tab, hw):
    """(B, S, 3C) -> (B*heads, S, H+W) bf16 factors."""
    h, w = hw
    b, s, _ = qkv.shape
    q = qkv[:, :, :C].reshape(b, h, w, HEADS, HD)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", q, rh_tab, preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", q, rw_tab, preferred_element_type=jnp.float32)
    out = jnp.concatenate([rel_h, rel_w], axis=-1).astype(qkv.dtype)
    return out.reshape(b * HEADS, s, h + w)


def ref_attention(qkv, rh_tab, rw_tab, hw):
    """Reference: unpacked XLA attention with materialized bias (small inputs)."""
    h, w = hw
    b, s, _ = qkv.shape
    qkv3 = qkv.reshape(b, s, 3, HEADS, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv3[0], qkv3[1], qkv3[2]
    scale = HD ** -0.5
    scores = jnp.einsum("bnqd,bnkd->bnqk", q * scale, k, preferred_element_type=jnp.float32)
    q_r = q.reshape(b, HEADS, h, w, HD)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", q_r, rh_tab)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", q_r, rw_tab)
    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(b, HEADS, s, s)
    scores = scores + bias.astype(scores.dtype)
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", p, v)
    return out.transpose(0, 2, 1, 3).reshape(b, s, C)


def check_correctness():
    key = jax.random.PRNGKey(0)
    b, g = 2, 16
    s = g * g
    global S
    qkv = jax.random.normal(key, (b, s, 3 * C), jnp.float32).astype(jnp.bfloat16) * 0.3
    rh_tab = jax.random.normal(jax.random.PRNGKey(1), (g, g, HD), jnp.bfloat16) * 0.1
    rw_tab = jax.random.normal(jax.random.PRNGKey(2), (g, g, HD), jnp.bfloat16) * 0.1

    rel_hw = rel_factors_packed(qkv, rh_tab, rw_tab, (g, g))
    out2 = flash_v2(qkv, rel_hw, (g, g), block_q=128)
    ref = ref_attention(qkv, rh_tab, rw_tab, (g, g))
    err = jnp.max(jnp.abs(out2.astype(jnp.float32) - ref.astype(jnp.float32)))
    rel = err / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-6)
    print(f"v2 vs ref: max abs err {float(err):.5f}  rel {float(rel):.5f}")


def bench():
    qkv = jnp.ones((B, S, 3 * C), jnp.bfloat16) * 0.01
    rh_tab = jnp.ones((GRID, GRID, HD), jnp.bfloat16) * 0.01

    def make_v2(n):
        @jax.jit
        def prog(qkv, rh_tab):
            def body(y, _):
                rel_hw = rel_factors_packed(y, rh_tab, rh_tab, (GRID, GRID))
                out = flash_v2(y, rel_hw, (GRID, GRID))
                return jnp.concatenate([out, out, out], axis=-1), ()
            y, _ = jax.lax.scan(body, qkv, None, length=n)
            return y.mean()
        return prog

    t = slope_time(make_v2, (qkv, rh_tab))
    print(f"flash v2 global layer (incl factors+concat sim): {t*1e3:.2f} ms")

    # kernel only (factors precomputed)
    rel_hw = jnp.ones((B * HEADS, S, 2 * GRID), jnp.bfloat16) * 0.01
    def make_kern(n):
        @jax.jit
        def prog(qkv, rel_hw):
            def body(y, _):
                out = flash_v2(y, rel_hw, (GRID, GRID))
                return jnp.concatenate([out, out, out], axis=-1), ()
            y, _ = jax.lax.scan(body, qkv, None, length=n)
            return y.mean()
        return prog
    t = slope_time(make_kern, (qkv, rel_hw))
    print(f"flash v2 kernel only: {t*1e3:.2f} ms")


if __name__ == "__main__":
    if "check" in sys.argv:
        check_correctness()
    else:
        check_correctness()
        bench()
