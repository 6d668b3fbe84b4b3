"""Multi-level RoI feature extraction (replaces mmcv SingleRoIExtractor).

Behavior parity: reference
``mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:13`` —
FPN level selection by ``floor(log2(sqrt(wh)/56))`` then RoIAlign on that
level.

TPU re-design: the pyramid is flattened into one (B, sum HW, C) tensor and
each RoI's bilinear sample indices are offset into its assigned level's slab,
so the whole multi-level extraction is one static gather pass (no per-level
scatter, no dynamic counts, no recompiles). Bilinear sampling exploits the
separable sample grid: the gather fetches the (2·n_y, 2·n_x) corner grid per
RoI in grid order, and corner weighting + adaptive masking + bin averaging
collapse into two tiny per-axis einsum contractions (fp32 accumulate) —
instead of per-sample elementwise passes over (R, P, C)-sized fp32 tensors
(measured: the elementwise tail alone was ~26 ms of the anchor predict
@1024^2 bs2; the einsum form retires it for ~1 ms of MXU work).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def map_roi_levels(rois: jax.Array, num_levels: int, finest_scale: int = 56) -> jax.Array:
    """rois (R, 5) -> level index (R,) int32."""
    scale = jnp.sqrt(
        (rois[:, 3] - rois[:, 1]) * (rois[:, 4] - rois[:, 2])
    )
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def _axis_corners(vs: jax.Array, lim: jax.Array):
    """Per-axis bilinear pieces. vs (R, n) sample coords; lim (R, 1) size.

    Returns (lo, hi, frac, inside): integer corner coords (R, n), the
    fractional weight of the high corner, and the mmcv inside-the-map mask
    (samples outside (-1, lim) contribute zero).
    """
    inside = (vs > -1.0) & (vs < lim)
    vc = jnp.clip(vs, 0.0, None)
    lo = jnp.minimum(jnp.floor(vc), lim - 1)
    hi = jnp.minimum(lo + 1, lim - 1)
    frac = jnp.clip(vc - lo, 0.0, 1.0)
    return lo, hi, frac, inside


def extract_roi_feats(
    feats: Sequence[jax.Array],  # per-level NHWC maps
    rois: jax.Array,  # (R, 5) [batch_idx, x1, y1, x2, y2] in image coords
    out_size: Tuple[int, int] = (7, 7),
    featmap_strides: Sequence[int] = (4, 8, 16, 32),
    finest_scale: int = 56,
    sampling_ratio: int = 2,
    max_adaptive_ratio: int = 4,
) -> jax.Array:
    """Returns (R, out_h, out_w, C) — single fused gather over the pyramid.

    ``sampling_ratio=0`` reproduces mmcv's adaptive mode exactly (per-RoI
    ``ceil(bin_size)`` samples per bin) via a static ``max_adaptive_ratio``
    grid with masked weights — with FPN level mapping, bin sizes are <= 4
    in practice, so the cap is exact for real configs.
    """
    num_levels = len(featmap_strides)
    target_lvl = map_roi_levels(rois, num_levels, finest_scale)
    b, _, _, c = feats[0].shape
    r = rois.shape[0]
    out_h, out_w = out_size
    adaptive = sampling_ratio == 0
    s = max_adaptive_ratio if adaptive else max(int(sampling_ratio), 1)

    flat = jnp.concatenate([f.reshape(b, -1, c) for f in feats], axis=1)
    level_sizes = [(f.shape[1], f.shape[2]) for f in feats]
    starts = np.cumsum([0] + [h * w for h, w in level_sizes])[:-1]
    lvl_h = jnp.asarray([h for h, _ in level_sizes], jnp.float32)[target_lvl]
    lvl_w = jnp.asarray([w for _, w in level_sizes], jnp.float32)[target_lvl]
    lvl_start = jnp.asarray(starts, jnp.int32)[target_lvl]
    scale = jnp.asarray(
        [1.0 / st for st in featmap_strides], jnp.float32
    )[target_lvl]

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * scale - 0.5
    y1 = rois[:, 2] * scale - 0.5
    x2 = rois[:, 3] * scale - 0.5
    y2 = rois[:, 4] * scale - 0.5
    bin_h = (y2 - y1) / out_h
    bin_w = (x2 - x1) / out_w

    # per-axis sample positions (n_y = out_h*s, n_x = out_w*s); the 2-D
    # sample set is their cartesian product, so everything downstream stays
    # separable
    if adaptive:
        # per-RoI grid count: ceil(bin) clamped to [1, s]; unused sample
        # slots get zero weight and duplicate slot-0's position
        ry = jnp.clip(jnp.ceil(bin_h), 1, s)[:, None]  # (R, 1)
        rx = jnp.clip(jnp.ceil(bin_w), 1, s)[:, None]
        j = jnp.arange(s, dtype=jnp.float32)[None, :]  # (1, s)
        fy = jnp.where(j[None] < ry[..., None], j[None], 0.0)  # (R, 1, s)
        fx = jnp.where(j[None] < rx[..., None], j[None], 0.0)
        oy = (fy + 0.5) / ry[..., None]  # (R, 1, s)
        ox = (fx + 0.5) / rx[..., None]
        iy = jnp.arange(out_h, dtype=jnp.float32)[None, :, None] + oy
        ix = jnp.arange(out_w, dtype=jnp.float32)[None, :, None] + ox
        ys = y1[:, None] + bin_h[:, None] * iy.reshape(r, -1)  # (R, n_y)
        xs = x1[:, None] + bin_w[:, None] * ix.reshape(r, -1)  # (R, n_x)
        my = jnp.broadcast_to(
            (j[None] < ry[..., None]).astype(jnp.float32), (r, out_h, s)
        ).reshape(r, -1)  # sample mask (R, n_y)
        mx = jnp.broadcast_to(
            (j[None] < rx[..., None]).astype(jnp.float32), (r, out_w, s)
        ).reshape(r, -1)
    else:
        iy = (jnp.arange(out_h)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ix = (jnp.arange(out_w)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ys = y1[:, None] + bin_h[:, None] * iy[None, :]
        xs = x1[:, None] + bin_w[:, None] * ix[None, :]
        my = jnp.ones((r, out_h * s), jnp.float32)
        mx = jnp.ones((r, out_w * s), jnp.float32)

    h_r = lvl_h[:, None]
    w_r = lvl_w[:, None]
    y_lo, y_hi, ly, ins_y = _axis_corners(ys, h_r)
    x_lo, x_hi, lx, ins_x = _axis_corners(xs, w_r)
    n_y = ys.shape[1]
    n_x = xs.shape[1]

    # corner-grid gather: one linear-index row take for the full
    # (2 n_y, 2 n_x) corner grid per RoI. Folding the batch axis into the
    # row index lets XLA use its fast embedding-lookup gather — the previous
    # two-axis fancy index (batch_idx, idx) scalarized (116 ms of the 210 ms
    # anchor predict @1024^2 bs2).
    base = (batch_idx * flat.shape[1]) + lvl_start  # (R,)
    w_i = w_r.astype(jnp.int32)  # (R, 1)
    flat2 = flat.reshape(b * flat.shape[1], c)
    ygrid = jnp.concatenate([y_lo, y_hi], axis=1).astype(jnp.int32)  # (R, 2n_y)
    xgrid = jnp.concatenate([x_lo, x_hi], axis=1).astype(jnp.int32)  # (R, 2n_x)
    idx = (
        base[:, None, None]
        + ygrid[:, :, None] * w_i[:, :, None]
        + xgrid[:, None, :]
    )  # (R, 2n_y, 2n_x)
    v = jnp.take(flat2, idx.reshape(r, -1), axis=0).reshape(r, 2 * n_y, 2 * n_x, c)

    # per-axis reduction weights (R, out, 2n): corner weight x adaptive
    # sample mask x inside mask, scattered to output bins by the STATIC
    # sample->bin one-hot. Two einsums (fp32 accumulate) then replace the
    # whole per-sample elementwise tail.
    oh_y = (
        (np.arange(n_y) // s)[None, :] == np.arange(out_h)[:, None]
    ).astype(np.float32)  # (out_h, n_y) static
    oh_x = (
        (np.arange(n_x) // s)[None, :] == np.arange(out_w)[:, None]
    ).astype(np.float32)

    dt = flat.dtype
    wy_s = my * ins_y.astype(jnp.float32)  # (R, n_y)
    wx_s = mx * ins_x.astype(jnp.float32)
    wy = jnp.concatenate([(1.0 - ly) * wy_s, ly * wy_s], axis=1)  # (R, 2n_y)
    wx = jnp.concatenate([(1.0 - lx) * wx_s, lx * wx_s], axis=1)
    oh2_y = jnp.asarray(np.concatenate([oh_y, oh_y], axis=1))  # (out_h, 2n_y)
    oh2_x = jnp.asarray(np.concatenate([oh_x, oh_x], axis=1))
    wy_b = (wy[:, None, :] * oh2_y[None]).astype(dt)  # (R, out_h, 2n_y)
    wx_b = (wx[:, None, :] * oh2_x[None]).astype(dt)  # (R, out_w, 2n_x)

    t = jnp.einsum(
        "riu,ruvc->rivc", wy_b, v, preferred_element_type=jnp.float32
    )  # (R, out_h, 2n_x, C)
    out = jnp.einsum(
        "rjv,rivc->rijc", wx_b, t, preferred_element_type=jnp.float32
    )  # (R, out_h, out_w, C) fp32

    # bin averaging: count = (samples per y-bin) x (samples per x-bin) —
    # mmcv divides by the full grid count (outside samples still counted)
    cy = my @ oh_y.T  # (R, out_h)
    cx = mx @ oh_x.T
    count = cy[:, :, None] * cx[:, None, :]
    return (out / count[..., None]).astype(dt)
