"""Multi-level RoI feature extraction (replaces mmcv SingleRoIExtractor).

Behavior parity: reference
``mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:13`` —
FPN level selection by ``floor(log2(sqrt(wh)/56))`` then RoIAlign on that
level.

TPU re-design: instead of scattering RoIs to their levels (dynamic counts),
RoIAlign runs on *every* level for *all* RoIs and a one-hot level mask selects
the result. 4x the gather FLOPs of the scatter formulation, but fully static
and negligible next to the ViT encoder; no host sync, no recompile.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from rsprompter_tpu.ops.roi_align import roi_align


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
) -> jax.Array:
    """Returns (R, out_h, out_w, C)."""
    num_levels = len(featmap_strides)
    target_lvl = map_roi_levels(rois, num_levels, finest_scale)
    out = None
    for lvl, (feat, stride) in enumerate(zip(feats, featmap_strides)):
        feats_lvl = roi_align(
            feat, rois, out_size, spatial_scale=1.0 / stride,
            sampling_ratio=sampling_ratio,
        )
        mask = (target_lvl == lvl).astype(feats_lvl.dtype)[:, None, None, None]
        out = feats_lvl * mask if out is None else out + feats_lvl * mask
    return out
