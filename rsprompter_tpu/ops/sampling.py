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

    # Corner-packed linear-index gather: ONE row take fetches all four
    # bilinear corners. The map is zero-padded by 1 and the 2x2 neighborhood
    # packed into the channel axis (P4[y, x] = [V[y,x], V[y,x+1], V[y+1,x],
    # V[y+1,x+1]]), so each sample is one (H+1)(W+1)-row lookup of 4C
    # channels instead of four C-channel lookups. 4x fewer gather rows at
    # 4x the row width — and the backward's scatter-add (the take's
    # transpose, the hot cost of MSDeformAttn training) shrinks the same
    # way; the packing's own transpose is dense pad/slice adds. A plain
    # three-axis fancy index img[b, y, x] scalarizes in XLA entirely (the
    # RoIAlign pathology — see roi_extractor.py).
    bsz = img.shape[0]
    p = grid.shape[1]
    c = img.shape[-1]
    padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [padded[:, :-1, :-1], padded[:, :-1, 1:],
         padded[:, 1:, :-1], padded[:, 1:, 1:]], axis=-1,
    )  # (B, H+1, W+1, 4C); row (y+1, x+1) holds V's 2x2 block at (y, x)
    flat = packed.reshape(bsz * (h + 1) * (w + 1), 4 * c)
    base = (jnp.arange(bsz) * ((h + 1) * (w + 1)))[:, None]
    yc = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    xc = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    idx = base + yc * (w + 1) + xc  # (B, P)
    v4 = jnp.take(flat, idx.reshape(-1), axis=0).reshape(bsz, p, 4, c)

    def inside(yi, xi):
        return (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)

    # masks keep zeros-padding semantics for far-out samples (the clip can
    # land their lookup on a valid interior row); partially-inside samples
    # read true zeros from the pad ring, but the masks cost nothing extra
    w4 = jnp.stack(
        [
            wy0 * wx0 * inside(y0, x0),
            wy0 * wx1 * inside(y0, x1),
            wy1 * wx0 * inside(y1, x0),
            wy1 * wx1 * inside(y1, x1),
        ],
        axis=-1,
    )  # (B, P, 4)
    # w4 stays fp32, matching the previous fp32 weighting/accumulation
    return (v4 * w4[..., None]).sum(axis=2)


def point_sample(img: jax.Array, points: jax.Array, align_corners: bool = False):
    """img (B,H,W,C); points (B,P,2) in [0,1] (x, y) -> (B,P,C)."""
    grid = points * 2.0 - 1.0
    return grid_sample_nhwc(img, grid, align_corners=align_corners)
