"""Multi-scale deformable attention (replaces the mmcv CUDA op, SURVEY §2.4).

Behavior parity: mmcv ``MultiScaleDeformableAttention`` as used by the
Mask2Former pixel decoder (reference
``mmdet/models/layers/msdeformattn_pixel_decoder.py:6``): per query, ``P``
learned sampling points per head per level, bilinear-sampled from the value
maps (grid_sample align_corners=False semantics) and combined with
softmax-normalized attention weights.

TPU formulation: the sampling is a batched gather (``grid_sample_nhwc``) per
level — XLA lowers it to vectorized dynamic-gathers; no scatter, fully static.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from rsprompter_tpu.ops.sampling import grid_sample_nhwc


def ms_deform_attn_core(
    value_levels: Sequence[jax.Array],  # per level (B, H_l, W_l, heads, hd)
    sampling_locations: jax.Array,  # (B, Q, heads, L, P, 2) normalized [0,1]
    attention_weights: jax.Array,  # (B, Q, heads, L, P) softmaxed
) -> jax.Array:
    """Returns (B, Q, heads*hd)."""
    b, q, n_heads, n_levels, n_points, _ = sampling_locations.shape
    hd = value_levels[0].shape[-1]
    out = jnp.zeros((b, q, n_heads, hd), jnp.float32)
    for lvl, val in enumerate(value_levels):
        # (B, H, W, heads, hd) -> (B*heads, H, W, hd)
        bh = val.shape[0]
        v = val.transpose(0, 3, 1, 2, 4).reshape(
            bh * n_heads, val.shape[1], val.shape[2], hd
        )
        # locations for this level: (B, Q, heads, P, 2) -> (B*heads, Q*P, 2)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, heads, P, 2)
        grid = 2.0 * loc - 1.0
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(bh * n_heads, q * n_points, 2)
        sampled = grid_sample_nhwc(v, grid, align_corners=False)
        sampled = sampled.reshape(bh, n_heads, q, n_points, hd)
        w = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (B,heads,Q,P)
        out = out + jnp.einsum(
            "bhqp,bhqpd->bqhd", w.astype(jnp.float32), sampled.astype(jnp.float32)
        )
    return out.reshape(b, q, n_heads * hd)
