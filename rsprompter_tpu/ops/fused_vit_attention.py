"""Fused SAM-ViT attention (TPU Pallas, v2 of the encoder hot path).

Replaces ``flash_attention_rel_pos`` as the encoder's attention engine
(reference behavior: HF ``SamVisionAttention`` / decomposed rel-pos of
``mmpretrain/models/backbones/vit_sam.py:78-157``). On-chip measurements
(scripts/perf_probe.py) showed the v1 path HBM/VPU-bound, not MXU-bound;
three structural changes fix that:

1. **Gather-free rel-pos factors.** The per-(q, k) bias factors
   ``rel_h[q, kr] = q . T_h[(qr - kr) + L - 1]`` come from a grouped einsum
   against statically pre-gathered slices of the tiny raw table, emitted in
   flipped column order (j = L-1-kr) so the realignment is the contiguous
   slice ``qr + j`` (the flip absorbs into the expansion matrix). In-context
   A/B on chip: einsum beats both take_along_axis (-2 ms) and a staircase
   reshape (-12 ms) across the 4 global layers @bs8.

2. **Single K=128 bias expansion.** [rel_h | rel_w] packed per head multiply
   ONE 0/1 expansion matrix E (2L, S) inside the kernel — one MXU pass
   instead of two half-empty K<=64 passes (measured: each pass ~1.4 ms on
   the 4096-token global layers).

3. **Head-major qkv layout from an einsum.** qkv arrives as (B, 3n, S, 64)
   produced by ``einsum('bsc,ncd->bnsd')`` — cheaper than matmul + 5D
   transpose and exactly the per-(batch, head) blocking the kernel wants.
   Two heads per grid cell let Mosaic overlap one head's VPU softmax with
   the other head's MXU matmuls. ``exp2`` in fp32 replaces ``exp`` (same
   numerics to 1 ulp, measured ~0.8 ms/layer faster).

Backward runs an XLA recompute (flash-style, O(S) memory) via ``custom_vjp``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_DIM = 64  # SAM ViT-B/L/H all use head_dim 64
LOG2E = 1.4426950408889634


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _resize_table(table: jax.Array, length: int) -> jax.Array:
    """Linear-resize a (L, d) rel-pos table to ``length`` rows (trace-time);
    mirrors reference ``vit_sam.py:78-113`` interpolation on size mismatch."""
    if table.shape[0] != length:
        table = jax.image.resize(table, (length, table.shape[1]), method="linear")
    return table


def rel_factors(
    q: jax.Array,  # (B, n, S, d) head-major queries
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    hw: Tuple[int, int],
) -> jax.Array:
    """Factors (B, n, S, 2L), L = max(h, w): [rel_h pad L | rel_w pad L].

    Column order is FLIPPED: entry j holds the factor for key offset
    ``kr = h-1-j`` (``rel[q, kr] = q . T[(qr - kr) + h - 1]`` = the j-th
    element of ``(q @ T^T)[qr : qr+h]``). The flip costs nothing here — it
    absorbs into :func:`_expansion_matrix`, which one-hots ``h-1-j`` — and
    keeps the realignment a static pre-gather of the tiny raw table
    (indices ``qr + j``) instead of a per-(q, k) minor-dim gather of the
    big factor tensor.
    """
    h, w = hw
    b, n, s, d = q.shape
    assert s == h * w
    th = _resize_table(rel_pos_h, 2 * h - 1).astype(q.dtype)
    tw = _resize_table(rel_pos_w, 2 * w - 1).astype(q.dtype)
    lmax = max(h, w)

    # pre-gather the tiny raw tables to (qpos, j, d) and contract with a
    # grouped einsum. In-context A/B on chip (global 64x64 grid, bs8, 4
    # layers): einsum 47.4 ms vs minor-dim take_along_axis 49.3 ms vs
    # staircase reshape 59.5 ms — isolated microbenches rank these
    # differently, but embedded in the layer the einsum wins.
    qg = q.reshape(b * n, h, w, d)
    idx_h = jnp.arange(h)[:, None] + jnp.arange(h)[None, :]  # [qr, j] -> qr+j
    idx_w = jnp.arange(w)[:, None] + jnp.arange(w)[None, :]
    th_g = th[idx_h]  # (h, h, d)
    tw_g = tw[idx_w]  # (w, w, d)
    rel_h = jnp.einsum("bhwc,hjc->bhwj", qg, th_g)
    rel_w = jnp.einsum("bhwc,wjc->bhwj", qg, tw_g)

    if h < lmax:
        rel_h = jnp.pad(rel_h, ((0, 0), (0, 0), (0, 0), (0, lmax - h)))
    if w < lmax:
        rel_w = jnp.pad(rel_w, ((0, 0), (0, 0), (0, 0), (0, lmax - w)))
    packed = jnp.concatenate([rel_h, rel_w], axis=-1)  # (b*n, h, w, 2L)
    return packed.reshape(b, n, s, 2 * lmax)


def _expansion_matrix(hw: Tuple[int, int], dtype) -> jax.Array:
    """E (2L, S) for the FLIPPED factor layout of :func:`rel_factors`:
    row j of the top half one-hots tokens whose grid row is ``h-1-j``; row j
    of the bottom half one-hots grid col ``w-1-j``. Padding rows (j >= h or
    j >= w) match nothing and stay zero."""
    h, w = hw
    lmax = max(h, w)
    rows = jnp.repeat(jnp.arange(h), w)
    cols = jnp.tile(jnp.arange(w), h)
    eh = (rows[None, :] == (h - 1 - jnp.arange(lmax))[:, None]).astype(dtype)
    ew = (cols[None, :] == (w - 1 - jnp.arange(lmax))[:, None]).astype(dtype)
    return jnp.concatenate([eh, ew], axis=0)  # (2L, S)


def rel_factors_pair(
    q_pair: jax.Array,  # (B, n/2, S, 128) lane-packed head pairs
    rel_pos_h: jax.Array,
    rel_pos_w: jax.Array,
    hw: Tuple[int, int],
    direct: bool = False,
) -> jax.Array:
    """Factors for PAIR-PACKED heads: (B, n/2, S, 4L), L = max(h, w), laid
    out ``[h_a pad L | w_a pad L | h_b pad L | w_b pad L]`` (flipped-j order
    like :func:`rel_factors`), i.e. each head's 2L half is contiguous so the
    global kernel lane-slices at the aligned 2L boundary and reuses the
    per-head expansion matrix.

    ``direct=True`` emits UNFLIPPED columns instead (entry j holds the factor
    for key row/col j: ``fh[q, kr] = q . T[(qr - kr) + h - 1]``) — the layout
    the k-tiled global kernel consumes, where the bias is built per key tile
    by lane broadcasts rather than an expansion matmul.

    The contraction runs at lane width 128 against block-diagonal tables —
    measured ~4-8x cheaper on chip than the 64-lane per-head einsum (the
    dense minor dim lets XLA keep one layout throughout).
    """
    h, w = hw
    b, np_, s, d2 = q_pair.shape
    d = d2 // 2
    assert s == h * w
    th = _resize_table(rel_pos_h, 2 * h - 1).astype(q_pair.dtype)
    tw = _resize_table(rel_pos_w, 2 * w - 1).astype(q_pair.dtype)
    lmax = max(h, w)
    if direct:
        idx_h = jnp.arange(h)[:, None] - jnp.arange(h)[None, :] + (h - 1)
        idx_w = jnp.arange(w)[:, None] - jnp.arange(w)[None, :] + (w - 1)
    else:
        idx_h = jnp.arange(h)[:, None] + jnp.arange(h)[None, :]
        idx_w = jnp.arange(w)[:, None] + jnp.arange(w)[None, :]
    th_g = th[idx_h]  # (h, h, d)
    tw_g = tw[idx_w]  # (w, w, d)

    def _block(tab, grp, j0):
        """(grp, L_tab, d) table -> (grp, 4L, 2d) with the table at j offset
        ``j0`` for lane half a and ``j0 + 2L`` for lane half b."""
        out = jnp.zeros((grp, 4 * lmax, 2 * d), tab.dtype)
        out = out.at[:, j0 : j0 + tab.shape[1], :d].set(tab)
        return out.at[:, 2 * lmax + j0 : 2 * lmax + j0 + tab.shape[1], d:].set(tab)

    t2h = _block(th_g, h, 0)
    t2w = _block(tw_g, w, lmax)
    qg = q_pair.reshape(b * np_, h, w, d2)
    rel = jnp.einsum("bhwc,hjc->bhwj", qg, t2h) + jnp.einsum(
        "bhwc,wjc->bhwj", qg, t2w
    )
    return rel.reshape(b, np_, s, 4 * lmax)


def _pair_expansions(hw: Tuple[int, int], dtype) -> Tuple[jax.Array, jax.Array]:
    """E_a / E_b (4L, S) for the ``[h_a|w_a|h_b|w_b]`` factor layout:
    ``f @ E_a`` expands head a's bias (head b's rows are zero) and vice
    versa. Used by the window kernel (K = 4L fits one K-tile there); the
    global kernel lane-slices f at 2L and uses :func:`_expansion_matrix`."""
    e = _expansion_matrix(hw, dtype)  # (2L, S)
    z = jnp.zeros_like(e)
    e_a = jnp.concatenate([e, z], axis=0)
    e_b = jnp.concatenate([z, e], axis=0)
    return e_a, e_b


def _mxu_denominator_mode() -> str:
    """RSPROMPTER_MXU_LSE: '' (default, VPU fp32 reduce) | 'dot' | 'concat'.

    A/B gate for computing the softmax denominator on the MXU instead of a
    separate scores-sized VPU reduce (read at trace time; see _attend_one).
    Sum values are identical to fp32 rounding (both accumulate bf16 p in
    fp32; only the reduction order differs)."""
    import os

    v = os.environ.get("RSPROMPTER_MXU_LSE", "")
    return v if v in ("dot", "concat") else ""


def _attend_one(q, k, v, f, e, scale, out_dtype, safe=False):
    """scores -> softmax -> PV for one head; bias via one expansion matmul.

    ``safe=False`` (inference default): normalize with a CLAMP instead of the
    usual running max: exp2(clip(s, -60, 60)) keeps the ratio exact whenever
    scores stay inside (-60, 60) — far beyond trained ViT logit ranges, and
    sum-overflow-safe in fp32 (4096 * 2^86 < 2^127). clip is pure elementwise
    where max is a cross-lane reduction + broadcast subtract; measured
    8.77 -> 8.24 ms on a global layer @bs8 (random data).

    ``safe=True`` (training): subtract the exact per-row max — shift-invariant
    for ANY logit range, matching the exact-softmax backward recompute even
    when from-scratch training spikes logits outside (-60, 60) (ADVICE r2:
    the clamp would otherwise silently flatten probabilities toward uniform
    exactly when forward/backward consistency matters most)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + jax.lax.dot(f, e, preferred_element_type=jnp.float32)
    if safe:
        s = s - jnp.max(s, axis=-1, keepdims=True)
    else:
        s = jnp.clip(s, -60.0, 60.0)
    # exp2 on fp32 == exp to 1 ulp; measurably faster on the VPU
    p = jnp.exp2(s * LOG2E).astype(v.dtype)
    mode = _mxu_denominator_mode()
    if mode == "concat":
        # fold the softmax denominator into the PV matmul: appending a ones
        # column to v makes the MXU compute sum(p) in the same contraction
        # (the extra lane rides the existing 128-lane padding), removing the
        # separate scores-sized VPU reduce pass
        ones = jnp.ones((v.shape[0], 1), v.dtype)
        ol = jax.lax.dot(
            p, jnp.concatenate([v, ones], axis=1),
            preferred_element_type=jnp.float32,
        )
        o, l = ol[:, :-1], ol[:, -1:]
    elif mode == "dot":
        # second tiny MXU matvec over p instead of the VPU reduce
        ones = jnp.ones((v.shape[0], 1), v.dtype)
        l = jax.lax.dot(p, ones, preferred_element_type=jnp.float32)
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    else:
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    return (o / l).astype(out_dtype)


def _global_kernel(q_ref, k_ref, v_ref, f_ref, e_ref, o_ref, *, scale, safe):
    """One (batch, head-pair, q-block) cell. Two heads per cell so Mosaic can
    overlap one head's VPU softmax with the other head's MXU matmuls."""
    e = e_ref[...]
    for j in range(2):
        o_ref[0, 0, j] = _attend_one(
            q_ref[0, 0, j], k_ref[0, 0, j], v_ref[0, 0, j], f_ref[0, 0, j],
            e, scale, o_ref.dtype, safe=safe,
        )


def _window_kernel(qkv_ref, f_ref, e_ref, o_ref, *, scale, heads, safe):
    """One window per cell; all heads unrolled (small-S windows are
    launch-bound on a per-head grid)."""
    e = e_ref[...]
    for n in range(heads):
        o_ref[0, n] = _attend_one(
            qkv_ref[0, n], qkv_ref[0, heads + n], qkv_ref[0, 2 * heads + n],
            f_ref[0, n], e, scale, o_ref.dtype, safe=safe,
        )


def _fused_fwd(qkv, rel_pos_h, rel_pos_w, hw, safe=False, block_q=512):
    """qkv: (B, 3n, S, d) head-major. Returns (B, n, S, d)."""
    h, w = hw
    b, n3, s, d = qkv.shape
    n = n3 // 3
    assert d == HEAD_DIM and s == h * w
    scale = d ** -0.5
    lmax = max(h, w)

    if rel_pos_h is not None:
        factors = rel_factors(qkv[:, :n], rel_pos_h, rel_pos_w, hw)
    else:
        factors = jnp.zeros((b, n, s, 2 * lmax), qkv.dtype)
    e = _expansion_matrix(hw, qkv.dtype)
    interpret = _interpret()

    if s <= 512:
        kernel = functools.partial(_window_kernel, scale=scale, heads=n, safe=safe)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, n, s, d), qkv.dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, n3, s, d), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, n, s, 2 * lmax), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((2 * lmax, s), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, n, s, d), lambda i: (i, 0, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qkv, factors, e)

    assert n % 2 == 0, "global kernel packs two heads per cell"
    bq = block_q
    while s % bq:
        bq //= 2
    kernel = functools.partial(_global_kernel, scale=scale, safe=safe)
    # head pairs are contiguous: view (B, 3n, S, d) as (B, 3n/2, 2, S, d) —
    # a free reshape — so one BlockSpec carries both heads of a pair
    qkv_p = qkv.reshape(b, n3 // 2, 2, s, d)
    fac_p = factors.reshape(b, n // 2, 2, s, 2 * lmax)
    hp = n // 2
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, 2, s, d), qkv.dtype),
        grid=(b, hp, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, 2, bq, d), lambda b_, p, i: (b_, p, 0, i, 0)),
            pl.BlockSpec((1, 1, 2, s, d), lambda b_, p, i: (b_, hp + p, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, s, d), lambda b_, p, i: (b_, 2 * hp + p, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, bq, 2 * lmax), lambda b_, p, i: (b_, p, 0, i, 0)),
            pl.BlockSpec((2 * lmax, s), lambda b_, p, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, bq, d), lambda b_, p, i: (b_, p, 0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # scores fp32 (512, S) + resident K/V; the default 16 MB scoped
            # limit is both too small and flakily enforced across grid sizes
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p, fac_p, e)
    return out.reshape(b, n, s, d)


def _reference_attention(qkv, rel_pos_h, rel_pos_w, hw, chunk=512):
    """Chunked XLA attention from (B, 3n, S, d) qkv (CPU path + backward
    recompute). Differentiable w.r.t. qkv and the raw tables."""
    h, w = hw
    b, n3, s, d = qkv.shape
    n = n3 // 3
    scale = d ** -0.5
    q, k, v = qkv[:, :n], qkv[:, n : 2 * n], qkv[:, 2 * n :]
    lmax = max(h, w)

    if rel_pos_h is not None:
        packed = rel_factors(q, rel_pos_h, rel_pos_w, hw)
        # un-flip the j = L-1-kr column order (see rel_factors docstring)
        rel_h = packed[..., :h][..., ::-1].reshape(b * n, s, h)
        rel_w = packed[..., lmax : lmax + w][..., ::-1].reshape(b * n, s, w)
    else:
        rel_h = jnp.zeros((b * n, s, h), qkv.dtype)
        rel_w = jnp.zeros((b * n, s, w), qkv.dtype)

    bn = b * n
    q = q.reshape(bn, s, d)
    k = k.reshape(bn, s, d)
    v = v.reshape(bn, s, d)
    chunk = min(chunk, s)
    while s % chunk:
        chunk //= 2
    n_chunks = s // chunk

    def one_chunk(args):
        qc, rhc, rwc = args
        sc = jnp.einsum("bqd,bkd->bqk", qc, k, preferred_element_type=jnp.float32) * scale
        bias = (rhc[:, :, :, None] + rwc[:, :, None, :]).reshape(bn, qc.shape[1], s)
        sc = sc + bias.astype(sc.dtype)
        p = jax.nn.softmax(sc, axis=-1).astype(v.dtype)
        return jnp.einsum("bqk,bkd->bqd", p, v)

    qs = q.reshape(bn, n_chunks, chunk, d).transpose(1, 0, 2, 3)
    rhs = rel_h.reshape(bn, n_chunks, chunk, h).transpose(1, 0, 2, 3)
    rws = rel_w.reshape(bn, n_chunks, chunk, w).transpose(1, 0, 2, 3)
    out = jax.lax.map(one_chunk, (qs, rhs, rws))
    return out.transpose(1, 0, 2, 3).reshape(b, n, s, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_qkv_attention(qkv, rel_pos_h, rel_pos_w, hw, safe=False):
    """Attention over an (h, w) token grid from head-major packed qkv.

    Args:
      qkv: (B, 3*heads, S, 64) — heads-major [q heads | k heads | v heads],
        e.g. from ``einsum('bsc,ncd->bnsd', x, W.reshape/transposed)``.
      rel_pos_h/w: raw (2L-1, 64) decomposed rel-pos tables, or None.
      hw: static (h, w), S = h*w.
      safe: static; True = exact max-subtracted softmax (training-safe for
        any logit range), False = clamped softmax (faster; exact only while
        |logits| < 60 — fine for trained ViTs).

    Returns (B, heads, S, 64).
    """
    return _fused_fwd(qkv, rel_pos_h, rel_pos_w, hw, safe)


def _fused_fwd_vjp(qkv, rel_pos_h, rel_pos_w, hw, safe):
    return _fused_fwd(qkv, rel_pos_h, rel_pos_w, hw, safe), (
        qkv, rel_pos_h, rel_pos_w,
    )


def _fused_bwd_vjp(hw, safe, residuals, g):
    qkv, rel_pos_h, rel_pos_w = residuals

    def ref(qkv, th, tw):
        return _reference_attention(qkv, th, tw, hw)

    _, vjp = jax.vjp(ref, qkv, rel_pos_h, rel_pos_w)
    return vjp(g)


fused_qkv_attention.defvjp(_fused_fwd_vjp, _fused_bwd_vjp)


# ---------------------------------------------------------------------------
# Pair-packed window path: heads ride the lane dimension in pairs (d2 = 128).
# The 64-lane-per-head block layout left every VMEM tile half empty — a pure
# copy kernel over those blocks cost 1.9 ms; the same copy over pair-packed
# blocks is ~free, and the full window attention drops ~4 ms -> <1 ms.
# ---------------------------------------------------------------------------


def _window_kernel_pair(
    qkv_ref, f_ref, ea_ref, eb_ref, o_ref, *, scale, pairs, d, safe
):
    """One window per cell, heads pair-packed in lanes. Per pair: lane-split
    q/k/v, bias = f @ E_half (the other head's factor rows are zero), two
    attends, lane-concat the outputs."""
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
            outs.append(
                _attend_one(
                    qp[:, sl], kp[:, sl], vp[:, sl], f, e, scale, o_ref.dtype,
                    safe=safe,
                )
            )
        o_ref[0, n] = jnp.concatenate(outs, axis=-1)


def _global_kernel_pair(
    q_ref, k_ref, v_ref, f_ref, e_ref, o_ref, *, scale, d, lmax, safe
):
    """One (batch, head-pair, q-block) cell, heads pair-packed in lanes.
    f lane-slices at the aligned 2L boundary; E shared between halves.
    (Hoisting the k/v lane-splits into VMEM scratch via pl.when was measured
    SLOWER — the per-cell slices pipeline better than the scratch round
    trip: 44.6 vs 46.2 ms for the 4 global layers @bs8.)"""
    e = e_ref[...]
    qp = q_ref[0, 0]
    kp = k_ref[0, 0]
    vp = v_ref[0, 0]
    fp = f_ref[0, 0]
    outs = []
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        fs = fp[:, half * 2 * lmax : (half + 1) * 2 * lmax]
        outs.append(
            _attend_one(
                qp[:, sl], kp[:, sl], vp[:, sl], fs, e, scale, o_ref.dtype,
                safe=safe,
            )
        )
    o_ref[0, 0] = jnp.concatenate(outs, axis=-1)


def _global_kernel_pair_tiled(
    q_ref, k_ref, v_ref, f_ref, o_ref, *, scale, d, lmax, h, w
):
    """Clamp-mode global attention, k-tiled (128-key tiles = ``128//w`` key
    rows). Two structural savings over :func:`_global_kernel_pair`, both
    measured MXU-pass-bound there (384 passes/cell-half; QK, bias expansion
    and PV each 128):

    - the rel-pos bias is built on the VPU per tile — ``fw`` repeats
      lane-periodically (one concat per half) and ``fh`` is a lane broadcast
      per key row (one select per extra row) — so the K=128 bias-expansion
      matmul disappears;
    - the softmax denominator rides a ones-column appended to v (N=65 pads
      to the same 128-lane tile), so the scores-wide VPU reduce disappears.

    256 MXU passes/cell-half. ``scale`` folds into q exactly (d=64 ->
    scale=0.125, a power of two — bit-exact in bf16). Clamp-mode only; the
    safe (running-max) path stays on the full-scores kernel.
    """
    qp = q_ref[0, 0]  # (bq, 2d)
    kp = k_ref[0, 0]  # (s, 2d)
    vp = v_ref[0, 0]
    fp = f_ref[0, 0]  # (bq, 4L) DIRECT factors [h_a|w_a|h_b|w_b]
    s = kp.shape[0]
    bq = qp.shape[0]
    bk = 128
    r = bk // w  # key rows per tile
    grp = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) // w
    outs = []
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        q = qp[:, sl] * jnp.asarray(scale, qp.dtype)
        k = kp[:, sl]
        f0 = half * 2 * lmax
        fh = fp[:, f0 : f0 + h].astype(jnp.float32)
        fw = fp[:, f0 + lmax : f0 + lmax + w].astype(jnp.float32)
        fw_rep = jnp.concatenate([fw] * r, axis=1)  # (bq, bk)
        v_aug = jnp.concatenate(
            [vp[:, sl], jnp.ones((s, 1), vp.dtype)], axis=1
        )  # (s, d+1): ones column -> denominator from the PV matmul
        acc = jnp.zeros((bq, d + 1), jnp.float32)
        for j in range(s // bk):
            kt = k[j * bk : (j + 1) * bk]
            st = jax.lax.dot_general(
                q, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bias = fh[:, j * r : j * r + 1]
            for i in range(1, r):
                bias = jnp.where(grp >= i, fh[:, j * r + i : j * r + i + 1], bias)
            st = jnp.clip(st + (bias + fw_rep), -60.0, 60.0)
            p = jnp.exp2(st * LOG2E).astype(vp.dtype)
            acc = acc + jax.lax.dot(
                p, v_aug[j * bk : (j + 1) * bk],
                preferred_element_type=jnp.float32,
            )
        outs.append((acc[:, :d] / acc[:, d:]).astype(o_ref.dtype))
    o_ref[0, 0] = jnp.concatenate(outs, axis=-1)


def _global_attn_mode() -> str:
    """RSPROMPTER_GLOBAL_ATTN: 'tiled' (default) | 'full' — A/B gate for the
    k-tiled clamp-mode global kernel vs the full-scores kernel (trace-time)."""
    import os

    v = os.environ.get("RSPROMPTER_GLOBAL_ATTN", "tiled")
    return v if v in ("tiled", "full") else "tiled"


def _pair_fwd(qkv_pair, rel_pos_h, rel_pos_w, hw, safe=False, block_q=512):
    """qkv_pair: (B, 3n/2, S, 2d) lane-packed. Returns (B, n/2, S, 2d)."""
    h, w = hw
    b, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    d = d2 // 2
    lmax = max(h, w)
    assert d == HEAD_DIM and s == h * w
    scale = d ** -0.5

    interpret = _interpret()
    tiled = (
        s > 512
        and not safe
        and _global_attn_mode() == "tiled"
        and w <= 128
        and 128 % w == 0
        and s % 128 == 0
    )
    if rel_pos_h is not None:
        factors = rel_factors_pair(
            qkv_pair[:, :np_], rel_pos_h, rel_pos_w, hw, direct=tiled
        )
    else:
        factors = jnp.zeros((b, np_, s, 4 * lmax), qkv_pair.dtype)

    if s <= 512:
        e_a, e_b = _pair_expansions(hw, qkv_pair.dtype)
        kernel = functools.partial(
            _window_kernel_pair, scale=scale, pairs=np_, d=d, safe=safe
        )
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
            interpret=interpret,
        )(qkv_pair, factors, e_a, e_b)

    bq = block_q
    while s % bq:
        bq //= 2
    if tiled:
        kernel = functools.partial(
            _global_kernel_pair_tiled, scale=scale, d=d, lmax=lmax, h=h, w=w
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, np_, s, d2), qkv_pair.dtype),
            grid=(b, np_, s // bq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d2), lambda b_, p, i: (b_, p, i, 0)),
                pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, np_ + p, 0, 0)),
                pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, 2 * np_ + p, 0, 0)),
                pl.BlockSpec((1, 1, bq, 4 * lmax), lambda b_, p, i: (b_, p, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d2), lambda b_, p, i: (b_, p, i, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qkv_pair, qkv_pair, qkv_pair, factors)
    e = _expansion_matrix(hw, qkv_pair.dtype)
    kernel = functools.partial(
        _global_kernel_pair, scale=scale, d=d, lmax=lmax, safe=safe
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, s, d2), qkv_pair.dtype),
        grid=(b, np_, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d2), lambda b_, p, i: (b_, p, i, 0)),
            pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, np_ + p, 0, 0)),
            pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, 2 * np_ + p, 0, 0)),
            pl.BlockSpec((1, 1, bq, 4 * lmax), lambda b_, p, i: (b_, p, i, 0)),
            pl.BlockSpec((2 * lmax, s), lambda b_, p, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d2), lambda b_, p, i: (b_, p, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv_pair, qkv_pair, qkv_pair, factors, e)


def _unpack_pairs(qkv_pair):
    """(B, m, S, 2d) lane pairs -> (B, 2m, S, d) per-head."""
    b, m, s, d2 = qkv_pair.shape
    d = d2 // 2
    x = qkv_pair.reshape(b, m, s, 2, d)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, 2 * m, s, d)


def _pack_pairs(qkv):
    """(B, 2m, S, d) per-head -> (B, m, S, 2d) lane pairs (inverse)."""
    b, n, s, d = qkv.shape
    x = qkv.reshape(b, n // 2, 2, s, d)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, n // 2, s, 2 * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_qkv_attention_pair(qkv_pair, rel_pos_h, rel_pos_w, hw, safe=False):
    """Window attention from PAIR-PACKED head-major qkv.

    Args:
      qkv_pair: (B, 3*heads/2, S, 128) — lanes hold two adjacent heads side
        by side ([q pairs | k pairs | v pairs]); produced for free by the qkv
        projection (adjacent head columns reshape into pairs).
      rel_pos_h/w: raw (2L-1, 64) decomposed rel-pos tables, or None.
      hw: static (h, w); S = h*w. Window grids (S <= 512) run one window
        per grid cell; larger grids run the (batch, pair, q-block) global
        kernel with k/v resident per pair.
      safe: static; True = exact max-subtracted softmax (training-safe for
        any logit range), False = clamped softmax (faster; exact while
        |logits| < 60).

    Returns (B, heads/2, S, 128), same lane pairing.
    """
    return _pair_fwd(qkv_pair, rel_pos_h, rel_pos_w, hw, safe)


def _pair_fwd_vjp(qkv_pair, rel_pos_h, rel_pos_w, hw, safe):
    return _pair_fwd(qkv_pair, rel_pos_h, rel_pos_w, hw, safe), (
        qkv_pair, rel_pos_h, rel_pos_w,
    )


def _use_pallas_bwd() -> bool:
    # single source of truth for the RSPROMPTER_PALLAS_BWD kill switch
    from rsprompter_tpu.ops.fused_mlp import _pallas_bwd_enabled

    return _pallas_bwd_enabled()


def _pair_bwd_vjp(hw, safe, residuals, g):
    qkv_pair, rel_pos_h, rel_pos_w = residuals
    if _use_pallas_bwd():
        # TPU: flash-style Pallas backward (recompute P in-kernel). CPU
        # keeps the XLA recompute — interpret-mode Pallas is slow and the
        # kernel has its own interpret-mode parity tests.
        return _pair_bwd_pallas(qkv_pair, rel_pos_h, rel_pos_w, g, hw)

    def ref(qkv_pair, th, tw):
        return _pack_pairs(_reference_attention(_unpack_pairs(qkv_pair), th, tw, hw))

    _, vjp = jax.vjp(ref, qkv_pair, rel_pos_h, rel_pos_w)
    return vjp(g)


fused_qkv_attention_pair.defvjp(_pair_fwd_vjp, _pair_bwd_vjp)


# ---------------------------------------------------------------------------
# Pallas backward for the pair-packed kernels (flash-style recompute).
#
# Math per head (S = scale*QK^T + F@E, P = softmax(S), O = PV), given dO:
#   dV = P^T dO
#   dP = dO V^T
#   delta = rowsum(dP * P)          == rowsum(dO * O): no O residual needed
#   dS = P * (dP - delta)
#   dQ = scale * dS K,   dK = scale * dS^T Q,   dF = dS E^T
# dF then backprops through rel_factors_pair OUTSIDE the kernel (a small
# einsum vjp yielding the extra dQ term and the raw-table grads).
# The recompute uses the EXACT max-subtracted softmax regardless of the
# forward's ``safe`` flag — identical semantics to the XLA-recompute backward
# this replaces (PARITY deviation 8 documents the clamped-forward mismatch).
# ---------------------------------------------------------------------------


def _attend_one_bwd(q, k, v, f, e, do, scale):
    """Recompute-and-differentiate one head. q/do: (bq, d); k/v: (S, d);
    f: (bq, 2L); e: (2L, S). Returns fp32 (dq, dk, dv, df)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + jax.lax.dot(f, e, preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p_un = jnp.exp2(s * LOG2E)
    p = p_un / jnp.sum(p_un, axis=-1, keepdims=True)  # fp32 (bq, S)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)  # fp32 (bq, S)
    ds_lo = ds.astype(q.dtype)
    p_lo = p.astype(q.dtype)
    dq = jax.lax.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale
    df = jax.lax.dot_general(
        ds_lo, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds_lo, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dv = jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dq, dk, dv, df


def _window_bwd_kernel_pair(
    qkv_ref, f_ref, e_ref, do_ref, dq_ref, dk_ref, dv_ref, df_ref,
    *, scale, pairs, d, lmax
):
    """One window per cell (S <= 512): all pairs/halves unrolled, no
    cross-cell accumulation. E (2L, S) is shared; each half's dF lands in
    its own 2L lane slice of the (S, 4L) factor grad."""
    e = e_ref[...]
    for n in range(pairs):
        qp = qkv_ref[0, n]
        kp = qkv_ref[0, pairs + n]
        vp = qkv_ref[0, 2 * pairs + n]
        fp = f_ref[0, n]
        dop = do_ref[0, n]
        for half in range(2):
            sl = slice(half * d, (half + 1) * d)
            fsl = slice(half * 2 * lmax, (half + 1) * 2 * lmax)
            dq, dk, dv, df = _attend_one_bwd(
                qp[:, sl], kp[:, sl], vp[:, sl], fp[:, fsl], e, dop[:, sl],
                scale,
            )
            dq_ref[0, n, :, sl] = dq
            dk_ref[0, n, :, sl] = dk
            dv_ref[0, n, :, sl] = dv
            df_ref[0, n, :, fsl] = df


def _global_bwd_kernel_pair(
    q_ref, k_ref, v_ref, f_ref, e_ref, do_ref,
    dq_ref, dk_ref, dv_ref, df_ref, *, scale, d, lmax
):
    """One (batch, head-pair, q-block) cell. dK/dV blocks ignore the q-block
    grid dim, so they stay resident in VMEM and accumulate across the
    sequential i sweep (zeroed at i == 0)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    e = e_ref[...]
    qp = q_ref[0, 0]
    kp = k_ref[0, 0]
    vp = v_ref[0, 0]
    fp = f_ref[0, 0]
    dop = do_ref[0, 0]
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        fsl = slice(half * 2 * lmax, (half + 1) * 2 * lmax)
        dq, dk, dv, df = _attend_one_bwd(
            qp[:, sl], kp[:, sl], vp[:, sl], fp[:, fsl], e, dop[:, sl], scale
        )
        dq_ref[0, 0, :, sl] = dq
        df_ref[0, 0, :, fsl] = df
        dk_ref[0, 0, :, sl] += dk
        dv_ref[0, 0, :, sl] += dv


def _pair_bwd_kernel_call(qkv_pair, factors, g, hw, block_q=256):
    """Pallas dispatch: returns fp32 (dq, dk, dv, dfactors), each
    (B, n/2, S, *) in the pair layout."""
    h, w = hw
    b, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    d = d2 // 2
    lmax = max(h, w)
    scale = d ** -0.5
    e = _expansion_matrix(hw, qkv_pair.dtype)
    interpret = _interpret()
    grad_shapes = [
        jax.ShapeDtypeStruct((b, np_, s, d2), jnp.float32),  # dq
        jax.ShapeDtypeStruct((b, np_, s, d2), jnp.float32),  # dk
        jax.ShapeDtypeStruct((b, np_, s, d2), jnp.float32),  # dv
        jax.ShapeDtypeStruct((b, np_, s, 4 * lmax), jnp.float32),  # df
    ]

    if s <= 512:
        kernel = functools.partial(
            _window_bwd_kernel_pair, scale=scale, pairs=np_, d=d, lmax=lmax
        )
        full = lambda i: (i, 0, 0, 0)  # noqa: E731
        return pl.pallas_call(
            kernel,
            out_shape=grad_shapes,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, n3p, s, d2), full),
                pl.BlockSpec((1, np_, s, 4 * lmax), full),
                pl.BlockSpec((2 * lmax, s), lambda i: (0, 0)),
                pl.BlockSpec((1, np_, s, d2), full),
            ],
            out_specs=[
                pl.BlockSpec((1, np_, s, d2), full),
                pl.BlockSpec((1, np_, s, d2), full),
                pl.BlockSpec((1, np_, s, d2), full),
                pl.BlockSpec((1, np_, s, 4 * lmax), full),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qkv_pair, factors, e, g)

    bq = block_q
    while s % bq:
        bq //= 2
    kernel = functools.partial(
        _global_bwd_kernel_pair, scale=scale, d=d, lmax=lmax
    )
    qblk = lambda b_, p, i: (b_, p, i, 0)  # noqa: E731
    resident = lambda b_, p, i: (b_, p, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=grad_shapes,
        grid=(b, np_, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d2), qblk),
            pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, np_ + p, 0, 0)),
            pl.BlockSpec((1, 1, s, d2), lambda b_, p, i: (b_, 2 * np_ + p, 0, 0)),
            pl.BlockSpec((1, 1, bq, 4 * lmax), qblk),
            pl.BlockSpec((2 * lmax, s), lambda b_, p, i: (0, 0)),
            pl.BlockSpec((1, 1, bq, d2), qblk),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d2), qblk),
            pl.BlockSpec((1, 1, s, d2), resident),  # dk: accumulates over i
            pl.BlockSpec((1, 1, s, d2), resident),  # dv: accumulates over i
            pl.BlockSpec((1, 1, bq, 4 * lmax), qblk),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv_pair, qkv_pair, qkv_pair, factors, e, g)


def _pair_bwd_pallas(qkv_pair, rel_pos_h, rel_pos_w, g, hw):
    """Full backward for fused_qkv_attention_pair: Pallas kernel for the
    attention grads + XLA vjp of rel_factors_pair for the bias-path grads."""
    h, w = hw
    b, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    lmax = max(h, w)
    q_pair = qkv_pair[:, :np_]
    if rel_pos_h is not None:
        factors = rel_factors_pair(q_pair, rel_pos_h, rel_pos_w, hw)
    else:
        factors = jnp.zeros((b, np_, s, 4 * lmax), qkv_pair.dtype)

    dq, dk, dv, df = _pair_bwd_kernel_call(qkv_pair, factors, g, hw)
    dth = dtw = None
    if rel_pos_h is not None:
        _, fvjp = jax.vjp(
            lambda qp, a, bb: rel_factors_pair(qp, a, bb, hw),
            q_pair, rel_pos_h, rel_pos_w,
        )
        dq_bias, dth, dtw = fvjp(df.astype(factors.dtype))
        dq = dq + dq_bias.astype(dq.dtype)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1).astype(qkv_pair.dtype)
    return dqkv, dth, dtw
