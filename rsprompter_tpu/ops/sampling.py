"""Bilinear grid/point sampling (replaces mmcv ``point_sample`` / grid_sample).

Semantics match torch ``F.grid_sample(..., align_corners=False,
padding_mode='zeros')`` — the mode mmcv's ``point_sample`` uses (reference
``mmdet/rsprompter/models.py:602-608`` point-sampled mask losses, and the
``MultiScaleDeformableAttention`` sampling core).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_nhwc(
    img: jax.Array, grid: jax.Array, align_corners: bool = False
) -> jax.Array:
    """img (B,H,W,C); grid (B,P,2) in [-1,1] (x, y order) -> (B,P,C)."""
    _, h, w, _ = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    # one linear-index row take for all four bilinear corners: the previous
    # three-axis fancy index img[b, y, x] scalarized in XLA (the same
    # pathology as the RoIAlign gather — see roi_extractor.py); folding
    # batch into the row index hits the fast embedding-lookup gather
    bsz = img.shape[0]
    p = grid.shape[1]
    c = img.shape[-1]
    flat = img.reshape(bsz * h * w, c)
    base = (jnp.arange(bsz) * (h * w))[:, None]

    def corner(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return base + yc * w + xc, inside

    i00, m00 = corner(y0, x0)
    i01, m01 = corner(y0, x1)
    i10, m10 = corner(y1, x0)
    i11, m11 = corner(y1, x1)
    idx4 = jnp.concatenate([i00, i01, i10, i11], axis=1)  # (B, 4P)
    v4 = jnp.take(flat, idx4.reshape(-1), axis=0).reshape(bsz, 4, p, c)
    w4 = jnp.stack(
        [
            wy0 * wx0 * m00,
            wy0 * wx1 * m01,
            wy1 * wx0 * m10,
            wy1 * wx1 * m11,
        ],
        axis=1,
    )  # (B, 4, P)
    # w4 stays fp32, matching the previous fp32 weighting/accumulation
    return (v4 * w4[..., None]).sum(axis=1)


def point_sample(img: jax.Array, points: jax.Array, align_corners: bool = False):
    """img (B,H,W,C); points (B,P,2) in [0,1] (x, y) -> (B,P,C)."""
    grid = points * 2.0 - 1.0
    return grid_sample_nhwc(img, grid, align_corners=align_corners)
