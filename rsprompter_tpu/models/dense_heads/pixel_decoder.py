"""MSDeformAttn pixel decoder (flax, NHWC).

Behavior parity: reference
``mmdet/models/layers/msdeformattn_pixel_decoder.py:21,150-246``: the top
``num_encoder_levels`` maps (low resolution) are projected to
``feat_channels``, run through ``num_layers`` deformable-attention encoder
layers (tokens of all levels concatenated), then an FPN top-down pass over the
remaining high-res levels; outputs ``(mask_feature stride-4 map,
multi_scale_memorys low->high res)``.

GroupNorm replaces mmcv's ``GN(32)`` exactly; module names mirror the torch
Sequential indices for checkpoint conversion.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.layers import sine_positional_encoding
from rsprompter_tpu.ops.msdeform_attn import ms_deform_attn_core


class MSDeformAttention(nn.Module):
    """One multi-scale deformable self-attention op."""

    embed_dims: int = 128
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, Q, C) (with query_pos already added)
        value: jax.Array,  # (B, V, C)
        reference_points: jax.Array,  # (B, Q, L, 2) normalized
        spatial_shapes: Sequence[Tuple[int, int]],
    ):
        b, q, c = query.shape
        nh, nl, npt = self.num_heads, self.num_levels, self.num_points
        hd = self.embed_dims // nh

        v = nn.Dense(self.embed_dims, dtype=self.dtype, name="value_proj")(value)
        offsets = nn.Dense(
            nh * nl * npt * 2, dtype=self.dtype, name="sampling_offsets"
        )(query).reshape(b, q, nh, nl, npt, 2)
        weights = nn.Dense(
            nh * nl * npt, dtype=self.dtype, name="attention_weights"
        )(query).reshape(b, q, nh, nl * npt)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).reshape(
            b, q, nh, nl, npt
        )

        # split value into per-level maps
        value_levels = []
        start = 0
        for (h, w) in spatial_shapes:
            lvl = v[:, start : start + h * w].reshape(b, h, w, nh, hd)
            value_levels.append(lvl)
            start += h * w

        wh = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], jnp.float32
        )  # (L, 2) in (x, y)
        locs = (
            reference_points[:, :, None, :, None, :]
            + offsets.astype(jnp.float32) / wh[None, None, None, :, None, :]
        )  # (B, Q, nh, L, P, 2)
        out = ms_deform_attn_core(value_levels, locs, weights)
        return nn.Dense(self.embed_dims, dtype=self.dtype, name="output_proj")(
            out.astype(query.dtype)
        )


class _FFN(nn.Module):
    embed_dims: int
    feedforward_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.feedforward_channels, dtype=self.dtype, name="layers_0_0")(x)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="layers_1")(y)
        return x + y


class DeformableEncoderLayer(nn.Module):
    """Post-norm: self_attn -> add -> LN -> FFN(+res) -> LN."""

    embed_dims: int = 128
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    feedforward_channels: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x, pos, reference_points, spatial_shapes):
        attn = MSDeformAttention(
            self.embed_dims, self.num_heads, self.num_levels, self.num_points,
            dtype=self.dtype, name="self_attn",
        )(x + pos, x, reference_points, spatial_shapes)
        x = x + attn
        x = nn.LayerNorm(name="norms_0")(x)
        x = _FFN(self.embed_dims, self.feedforward_channels, dtype=self.dtype,
                 name="ffn")(x)
        x = nn.LayerNorm(name="norms_1")(x)
        return x


class _GN(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]), name="gn")(x)


class MSDeformAttnPixelDecoder(nn.Module):
    feat_channels: int = 128
    out_channels: int = 256
    num_encoder_levels: int = 3
    num_encoder_layers: int = 3
    num_outs: int = 3
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 512
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        """feats: per-level NHWC maps (high->low res). Returns
        (mask_feature (B, H/4, W/4, out_channels), memorys low->high res)."""
        n_in = len(feats)
        n_enc = self.num_encoder_levels
        b = feats[0].shape[0]

        tokens, poss, shapes, refs = [], [], [], []
        for i in range(n_enc):
            level_idx = n_in - i - 1  # from lowest resolution up
            f = feats[level_idx]
            h, w = f.shape[1:3]
            x = nn.Conv(self.feat_channels, (1, 1), dtype=self.dtype,
                        name=f"input_convs_{i}_conv")(f)
            x = _GN(name=f"input_convs_{i}")(x)
            pe = sine_positional_encoding(h, w, num_feats=self.feat_channels // 2)
            level_emb = self.param(
                f"level_encoding_{i}", nn.initializers.normal(1.0),
                (self.feat_channels,),
            )
            pos = (pe + level_emb[None, None]).reshape(1, h * w, -1)
            # pixel-center reference points normalized by level extent
            ys = (jnp.arange(h) + 0.5) / h
            xs = (jnp.arange(w) + 0.5) / w
            ref = jnp.stack(jnp.meshgrid(xs, ys), axis=-1).reshape(h * w, 2)
            tokens.append(x.reshape(b, h * w, -1))
            poss.append(jnp.broadcast_to(pos, (b, h * w, self.feat_channels)))
            shapes.append((h, w))
            refs.append(ref)

        x = jnp.concatenate(tokens, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        ref = jnp.concatenate(refs, axis=0)  # (V, 2)
        ref = jnp.broadcast_to(
            ref[None, :, None, :], (b, ref.shape[0], n_enc, 2)
        )
        for li in range(self.num_encoder_layers):
            x = DeformableEncoderLayer(
                self.feat_channels, self.num_heads, n_enc, self.num_points,
                self.feedforward_channels, dtype=self.dtype,
                name=f"encoder_layers_{li}",
            )(x, pos, ref, shapes)

        # split back to maps (low -> high resolution)
        outs: List[jax.Array] = []
        start = 0
        for (h, w) in shapes:
            outs.append(x[:, start : start + h * w].reshape(b, h, w, -1))
            start += h * w

        # FPN top-down over the remaining (high-res) levels
        for i in range(n_in - n_enc - 1, -1, -1):
            lat = nn.Conv(self.feat_channels, (1, 1), use_bias=False,
                          dtype=self.dtype, name=f"lateral_convs_{i}_conv")(feats[i])
            lat = _GN(name=f"lateral_convs_{i}")(lat)
            up = jax.image.resize(
                outs[-1], (b, lat.shape[1], lat.shape[2], outs[-1].shape[-1]),
                method="bilinear",
            )
            y = lat + up
            y = nn.Conv(self.feat_channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"output_convs_{i}_conv")(y)
            y = _GN(name=f"output_convs_{i}")(y)
            y = nn.relu(y)
            outs.append(y)

        multi_scale = outs[: self.num_outs]
        mask_feature = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, name="mask_feature"
        )(outs[-1])
        return mask_feature, multi_scale
