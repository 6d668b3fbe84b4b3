"""RoIAlign as XLA gathers (replaces mmcv's CUDA RoIAlign, SURVEY §2.4).

Bilinear sampling semantics match the mmcv/torchvision ``aligned=True`` kernel
(reference use: ``mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py``
with ``roi_layer=dict(type='RoIAlign')``, configs
``configs/rsprompter/_base_/rsprompter_anchor.py:111,130``): continuous
coordinates with a -0.5 half-pixel offset, each output bin averaging a fixed
``sampling_ratio x sampling_ratio`` sample grid; out-of-range samples
contribute zero exactly as the CUDA kernel's border rules.

Note on ``sampling_ratio=0``: mmcv chooses ceil(bin_size) samples *per RoI*,
which is inherently dynamic-shape. On TPU we use a fixed grid (default 2,
torchvision's common setting); this is the one intentional numerical deviation
of the RoI path and is covered by AP-parity validation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jax.Array, batch_idx: jax.Array, y: jax.Array, x: jax.Array):
    """Sample feat (B,H,W,C) at continuous (y, x); zero outside [-1, H/W].

    batch_idx: (R,) int; y, x: (R, P) -> (R, P, C).
    """
    _, h, w, _ = feat.shape
    inside = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y), h - 1).astype(jnp.int32)
    x_low = jnp.minimum(jnp.floor(x), w - 1).astype(jnp.int32)
    y_high = jnp.minimum(y_low + 1, h - 1)
    x_high = jnp.minimum(x_low + 1, w - 1)
    ly = jnp.clip(y - y_low.astype(y.dtype), 0.0, 1.0)
    lx = jnp.clip(x - x_low.astype(x.dtype), 0.0, 1.0)
    hy, hx = 1.0 - ly, 1.0 - lx

    b = batch_idx[:, None]
    v1 = feat[b, y_low, x_low]
    v2 = feat[b, y_low, x_high]
    v3 = feat[b, y_high, x_low]
    v4 = feat[b, y_high, x_high]
    w1 = (hy * hx)[..., None]
    w2 = (hy * lx)[..., None]
    w3 = (ly * hx)[..., None]
    w4 = (ly * lx)[..., None]
    out = v1 * w1 + v2 * w2 + v3 * w3 + v4 * w4
    return jnp.where(inside[..., None], out, 0.0)


@partial(jax.jit, static_argnames=("out_size", "spatial_scale", "sampling_ratio", "aligned"))
def roi_align(
    features: jax.Array,
    rois: jax.Array,
    out_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """features (B,H,W,C) NHWC; rois (R,5) = [batch_idx, x1, y1, x2, y2].

    Returns (R, out_h, out_w, C).
    """
    out_h, out_w = out_size
    s = max(int(sampling_ratio), 1)
    batch_idx = rois[:, 0].astype(jnp.int32)
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / out_h
    bin_w = roi_w / out_w

    iy = (jnp.arange(out_h)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    ix = (jnp.arange(out_w)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)
    # sample coords: (R, out_h*s), (R, out_w*s)
    ys = y1[:, None] + bin_h[:, None] * iy[None, :]
    xs = x1[:, None] + bin_w[:, None] * ix[None, :]
    # full grid (R, out_h*s * out_w*s)
    yy = jnp.repeat(ys, out_w * s, axis=1)
    xx = jnp.tile(xs, (1, out_h * s))
    vals = _bilinear_gather(features, batch_idx, yy, xx)  # (R, P, C)
    c = features.shape[-1]
    vals = vals.reshape(-1, out_h, s, out_w, s, c)
    return vals.mean(axis=(2, 4))
