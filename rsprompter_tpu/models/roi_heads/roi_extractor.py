"""Multi-level RoI feature extraction (replaces mmcv SingleRoIExtractor).

Behavior parity: reference
``mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:13`` —
FPN level selection by ``floor(log2(sqrt(wh)/56))`` then RoIAlign on that
level.

TPU re-design: the pyramid is flattened into one (B, sum HW, C) tensor and
each RoI's bilinear sample indices are offset into its assigned level's slab
— the whole multi-level extraction is a single static gather pass (no
per-level scatter, no dynamic counts, no recompiles).
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

    All levels are flattened into one (B, sum HW, C) tensor; each RoI's sample
    indices are offset into its assigned level's slab, so the whole extraction
    is ONE bilinear gather pass instead of ``num_levels`` full passes (4x
    fewer gathers than the mask-and-sum formulation).

    ``sampling_ratio=0`` reproduces mmcv's adaptive mode exactly (per-RoI
    ``ceil(bin_size)`` samples per bin) via a static ``max_adaptive_ratio``
    grid with masked averaging — with FPN level mapping, bin sizes are <= 4
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

    if adaptive:
        # per-RoI grid count: ceil(bin) clamped to [1, s]; unused sample slots
        # get zero weight and duplicate slot-0's position
        ry = jnp.clip(jnp.ceil(bin_h), 1, s)[:, None]  # (R, 1)
        rx = jnp.clip(jnp.ceil(bin_w), 1, s)[:, None]
        j = jnp.arange(s, dtype=jnp.float32)[None, :]  # (1, s)
        fy = jnp.where(j[None] < ry[..., None], j[None], 0.0)  # (R, 1, s)
        fx = jnp.where(j[None] < rx[..., None], j[None], 0.0)
        oy = (fy + 0.5) / ry[..., None]  # (R, 1, s)
        ox = (fx + 0.5) / rx[..., None]
        iy = jnp.arange(out_h, dtype=jnp.float32)[None, :, None] + oy  # (R, out_h, s)
        ix = jnp.arange(out_w, dtype=jnp.float32)[None, :, None] + ox
        ys = y1[:, None] + bin_h[:, None] * iy.reshape(r, -1)
        xs = x1[:, None] + bin_w[:, None] * ix.reshape(r, -1)
        wy = (j[None] < ry[..., None]).astype(jnp.float32)  # (R, 1, s)
        wx = (j[None] < rx[..., None]).astype(jnp.float32)
        wyf = jnp.broadcast_to(wy, (r, out_h, s)).reshape(r, -1)
        wxf = jnp.broadcast_to(wx, (r, out_w, s)).reshape(r, -1)
        sample_w = (
            jnp.repeat(wyf, out_w * s, axis=1) * jnp.tile(wxf, (1, out_h * s))
        )
    else:
        iy = (jnp.arange(out_h)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ix = (jnp.arange(out_w)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
        ys = y1[:, None] + bin_h[:, None] * iy[None, :]  # (R, out_h*s)
        xs = x1[:, None] + bin_w[:, None] * ix[None, :]
        sample_w = None
    yy = jnp.repeat(ys, out_w * s, axis=1)  # (R, P)
    xx = jnp.tile(xs, (1, out_h * s))

    h_r = lvl_h[:, None]
    w_r = lvl_w[:, None]
    inside = (yy > -1.0) & (yy < h_r) & (xx > -1.0) & (xx < w_r)
    yyc = jnp.clip(yy, 0.0, None)
    xxc = jnp.clip(xx, 0.0, None)
    y_low = jnp.minimum(jnp.floor(yyc), h_r - 1)
    x_low = jnp.minimum(jnp.floor(xxc), w_r - 1)
    y_high = jnp.minimum(y_low + 1, h_r - 1)
    x_high = jnp.minimum(x_low + 1, w_r - 1)
    ly = jnp.clip(yyc - y_low, 0.0, 1.0)
    lx = jnp.clip(xxc - x_low, 0.0, 1.0)
    hy, hx = 1.0 - ly, 1.0 - lx

    base = lvl_start[:, None]
    w_i = w_r.astype(jnp.int32)

    def gather(yi, xi):
        idx = base + yi.astype(jnp.int32) * w_i + xi.astype(jnp.int32)
        return flat[batch_idx[:, None], idx]  # (R, P, C)

    dt = flat.dtype
    vals = (
        gather(y_low, x_low) * (hy * hx)[..., None].astype(dt)
        + gather(y_low, x_high) * (hy * lx)[..., None].astype(dt)
        + gather(y_high, x_low) * (ly * hx)[..., None].astype(dt)
        + gather(y_high, x_high) * (ly * lx)[..., None].astype(dt)
    )
    vals = jnp.where(inside[..., None], vals, 0)
    if adaptive:
        vals = vals.astype(jnp.float32) * sample_w[..., None]
        vals = vals.reshape(r, out_h, s, out_w, s, c).sum(axis=(2, 4))
        count = sample_w.reshape(r, out_h, s, out_w, s).sum(axis=(2, 4))
        return (vals / count[..., None]).astype(dt)
    vals = vals.reshape(r, out_h, s, out_w, s, c)
    return vals.astype(jnp.float32).mean(axis=(2, 4)).astype(dt)
