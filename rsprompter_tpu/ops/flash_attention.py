"""Pallas flash attention for SAM's global ViT layers (TPU).

The hot loop #1 of SURVEY §3.1: 4 global-attention layers over the 64x64=4096
token grid at 1024^2 input. The XLA path materializes (B, heads, 4096, 4096)
scores in HBM (~800MB/layer fp32); this kernel keeps everything in VMEM.

Design (SURVEY §7 hard-part #1 — decomposed rel-pos inside flash attention):
the bias is rank-structured, ``bias[q, k] = rel_h[q, row(k)] + rel_w[q, col(k)]``
with ``rel_h = einsum(q, Rh)`` (S x H) and ``rel_w = einsum(q, Rw)`` (S x W)
precomputed OUTSIDE the kernel (tiny: S*(H+W) vs S*S). Inside, each scores
tile rebuilds its bias block by broadcasting the two factors — never
materializing S x S anywhere.

Row-block formulation: one grid step owns a ``block_q`` slice of queries and
the FULL K/V (4096 x 64 = 1MB bf16 each — comfortably VMEM-resident), so a
single pass computes exact softmax without online-max bookkeeping. For longer
sequences than ~8k this would switch to the standard two-level KV tiling.

Backward: ``jax.custom_vjp`` recomputes attention per q-block with the same
bias factorization (flash-style recompute, O(S) memory), so the kernel is
usable under ``jax.grad`` (LoRA / full finetuning).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsprompter_tpu.ops.attention import decomposed_rel_pos_tables


def _fwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref, *, scale):
    """One (batch*head, q-block) cell: full-K attention with factored bias.

    The (block_q, S) bias block is expanded on the MXU as
    ``rh @ Eh + rw @ Ew`` with constant 0/1 expansion matrices Eh (H, S) /
    Ew (W, S) — Mosaic-friendly (no vector reshapes), and negligible FLOPs
    next to the q @ k^T contraction.
    """
    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (S, d)
    v = v_ref[0]  # (S, d)
    rh = rh_ref[0]  # (block_q, H)
    rw = rw_ref[0]  # (block_q, W)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, S)
    bias = jax.lax.dot(
        rh, eh_ref[...], preferred_element_type=jnp.float32
    ) + jax.lax.dot(rw, ew_ref[...], preferred_element_type=jnp.float32)
    s = s + bias

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m).astype(v.dtype)
    # normalize AFTER the PV matmul: divides (block_q, d) instead of
    # (block_q, S) — saves a full scores-sized VPU pass
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_fwd(q, k, v, rel_h, rel_w, scale, hw, block_q):
    """q,k,v: (BN, S, d); rel_h: (BN, S, H); rel_w: (BN, S, W)."""
    bn, s, d = q.shape
    h, w = hw
    block_q = min(block_q, s)
    grid = (bn, s // block_q)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    # constant expansion matrices: Eh[i, k] = 1 iff row(k) == i; Ew[j, k] = 1
    # iff col(k) == j (folded into the graph as constants)
    rows = jnp.repeat(jnp.arange(h), w)
    cols = jnp.tile(jnp.arange(w), h)
    eh = (rows[None, :] == jnp.arange(h)[:, None]).astype(q.dtype)
    ew = (cols[None, :] == jnp.arange(w)[:, None]).astype(q.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bn, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, h), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, w), lambda b, i: (b, i, 0)),
            pl.BlockSpec((h, s), lambda b, i: (0, 0)),
            pl.BlockSpec((w, s), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(q, k, v, rel_h, rel_w, eh, ew)


def _fwd_kernel_smallseq(
    q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref, *, scale, num_heads
):
    """Small-sequence (window) variant: one grid cell = one batch element,
    ALL heads processed in an unrolled loop. 196-token windows are tiny — a
    per-(batch, head) grid is launch-bound (thousands of ~us cells), so we
    amortize the cell overhead across heads instead.

    Refs: q/k/v (1, heads, S, d); rh (1, heads, S, H); rw (1, heads, S, W).
    """
    for h_i in range(num_heads):
        q = q_ref[0, h_i]
        k = k_ref[0, h_i]
        v = v_ref[0, h_i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        bias = jax.lax.dot(
            rh_ref[0, h_i], eh_ref[...], preferred_element_type=jnp.float32
        ) + jax.lax.dot(rw_ref[0, h_i], ew_ref[...], preferred_element_type=jnp.float32)
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(v.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h_i] = (o / l).astype(o_ref.dtype)


def _flash_fwd_smallseq(q, k, v, rel_h, rel_w, scale, hw):
    """q,k,v: (B, N, S, d) with small S; rel factors per head."""
    b, n, s, d = q.shape
    h, w = hw
    rows = jnp.repeat(jnp.arange(h), w)
    cols = jnp.tile(jnp.arange(w), h)
    eh = (rows[None, :] == jnp.arange(h)[:, None]).astype(q.dtype)
    ew = (cols[None, :] == jnp.arange(w)[:, None]).astype(q.dtype)
    kernel = functools.partial(_fwd_kernel_smallseq, scale=scale, num_heads=n)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, s, d), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, s, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, s, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, s, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, s, h), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, s, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((h, s), lambda i: (0, 0)),
            pl.BlockSpec((w, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, s, d), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(q, k, v, rel_h, rel_w, eh, ew)


def _attention_ref_chunked(q, k, v, rel_h, rel_w, scale, hw, chunk=512):
    """XLA fallback with q-chunking (used for backward recompute and CPU)."""
    h, w = hw
    bn, s, d = q.shape

    def one_chunk(args):
        qc, rhc, rwc = args  # (BN, C, d), (BN, C, H), (BN, C, W)
        sc = jnp.einsum(
            "bqd,bkd->bqk", qc, k, preferred_element_type=jnp.float32
        ) * scale
        bias = (rhc[:, :, :, None] + rwc[:, :, None, :]).reshape(
            bn, qc.shape[1], s
        )
        sc = sc + bias
        p = jax.nn.softmax(sc, axis=-1).astype(v.dtype)
        return jnp.einsum("bqk,bkd->bqd", p, v)

    n_chunks = max(s // chunk, 1)
    qs = q.reshape(bn, n_chunks, -1, d).transpose(1, 0, 2, 3)
    rhs = rel_h.reshape(bn, n_chunks, -1, h).transpose(1, 0, 2, 3)
    rws = rel_w.reshape(bn, n_chunks, -1, w).transpose(1, 0, 2, 3)
    out = jax.lax.map(one_chunk, (qs, rhs, rws))
    return out.transpose(1, 0, 2, 3).reshape(bn, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_core(q, k, v, rel_h, rel_w, scale, hw, block_q):
    return _flash_fwd(q, k, v, rel_h, rel_w, scale, hw, block_q)


def _flash_core_fwd(q, k, v, rel_h, rel_w, scale, hw, block_q):
    out = _flash_fwd(q, k, v, rel_h, rel_w, scale, hw, block_q)
    return out, (q, k, v, rel_h, rel_w)


def _flash_core_bwd(scale, hw, block_q, residuals, g):
    q, k, v, rel_h, rel_w = residuals

    def ref(q, k, v, rel_h, rel_w):
        return _attention_ref_chunked(q, k, v, rel_h, rel_w, scale, hw)

    _, vjp = jax.vjp(ref, q, k, v, rel_h, rel_w)
    return vjp(g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_core_small(q, k, v, rel_h, rel_w, scale, hw):
    return _flash_fwd_smallseq(q, k, v, rel_h, rel_w, scale, hw)


def _flash_core_small_fwd(q, k, v, rel_h, rel_w, scale, hw):
    out = _flash_fwd_smallseq(q, k, v, rel_h, rel_w, scale, hw)
    return out, (q, k, v, rel_h, rel_w)


def _flash_core_small_bwd(scale, hw, residuals, g):
    q, k, v, rel_h, rel_w = residuals
    b, n, s, d = q.shape
    h, w = hw

    def ref(q, k, v, rel_h, rel_w):
        out = _attention_ref_chunked(
            q.reshape(b * n, s, d), k.reshape(b * n, s, d),
            v.reshape(b * n, s, d), rel_h.reshape(b * n, s, h),
            rel_w.reshape(b * n, s, w), scale, hw, chunk=s,
        )
        return out.reshape(b, n, s, d)

    _, vjp = jax.vjp(ref, q, k, v, rel_h, rel_w)
    return vjp(g)


_flash_core_small.defvjp(_flash_core_small_fwd, _flash_core_small_bwd)


def flash_attention_rel_pos(
    q: jax.Array,  # (B, heads, S, d)
    k: jax.Array,
    v: jax.Array,
    hw: Tuple[int, int],
    rel_pos_h: Optional[jax.Array] = None,
    rel_pos_w: Optional[jax.Array] = None,
    block_q: int = 256,
) -> jax.Array:
    """Drop-in for ``attention_rel_pos`` (impl='flash')."""
    h, w = hw
    b, n, s, d = q.shape
    scale = d ** -0.5
    qf = q.reshape(b * n, s, d)
    if rel_pos_h is not None:
        rh_tab, rw_tab = decomposed_rel_pos_tables(
            rel_pos_h, rel_pos_w, (h, w), (h, w)
        )  # (H, H, d), (W, W, d)
        q_grid = qf.reshape(b * n, h, w, d)
        rel_h = jnp.einsum(
            "bhwc,hkc->bhwk", q_grid, rh_tab, preferred_element_type=jnp.float32
        ).astype(q.dtype).reshape(b * n, s, h)
        rel_w = jnp.einsum(
            "bhwc,wkc->bhwk", q_grid, rw_tab, preferred_element_type=jnp.float32
        ).astype(q.dtype).reshape(b * n, s, w)
    else:
        rel_h = jnp.zeros((b * n, s, h), q.dtype)
        rel_w = jnp.zeros((b * n, s, w), q.dtype)

    if s <= 512:
        # window-attention regime: amortize grid-cell overhead across heads
        out = _flash_core_small(
            q, k, v,
            rel_h.reshape(b, n, s, h), rel_w.reshape(b, n, s, w),
            scale, (h, w),
        )
        return out

    kf = k.reshape(b * n, s, d)
    vf = v.reshape(b * n, s, d)
    # pick a block that divides S; fp32 needs smaller tiles to fit VMEM
    bq = block_q if q.dtype.itemsize <= 2 else min(block_q, 128)
    while s % bq:
        bq //= 2
    out = _flash_core(qf, kf, vf, rel_h, rel_w, scale, (h, w), bq)
    return out.reshape(b, n, s, d)
