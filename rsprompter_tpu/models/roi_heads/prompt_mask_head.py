"""RSPrompter anchor-variant mask head: per-RoI prompt embeddings -> SAM decoder.

Behavior parity: reference ``RSPrompterAnchorMaskHead``
(``mmdet/rsprompter/models.py:1597-1784``):
  * ``point_emb`` = conv3x3 stride-2 + BN + ReLU + flatten + 3 linears
    (names ``point_emb.0/1/4/6/8``) -> ``per_pointset_point x C x
    (2 if sincos)`` per RoI (:1641-1651);
  * interleaved sincos reparam ``sin(x[::2]) + x[1::2]`` (:1671-1672,
    parity-critical SURVEY A.2);
  * frozen ``no_mask_embed`` dense prompts; SAM decoder over full image tokens
    (:1676-1694) -> 256^2 low-res masks + IoU.

TPU re-design: the reference's ``bincount``+``repeat_interleave`` RoI->image
fan-out (:1676-1683) disappears entirely — RoIs stay grouped per image as the
mask decoder's *point_batch* axis (B, R, K, C), which is numerically identical
and keeps every shape static.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam.configs import SamMaskDecoderConfig
from rsprompter_tpu.models.sam.mask_decoder import SamMaskDecoder


class RSPrompterAnchorMaskHead(nn.Module):
    decoder_config: SamMaskDecoderConfig
    in_channels: int = 256
    roi_feat_size: int = 14
    per_pointset_point: int = 5
    with_sincos: bool = True
    multimask_output: bool = False
    class_agnostic: bool = True
    dtype: Any = None

    def setup(self):
        c = self.in_channels
        num_sincos = 2 if self.with_sincos else 1
        self.point_emb_0 = nn.Conv(
            c, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="point_emb_0"
        )
        self.point_emb_1 = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, name="point_emb_1"
        )
        self.point_emb_4 = nn.Dense(c, dtype=self.dtype, name="point_emb_4")
        self.point_emb_6 = nn.Dense(c, dtype=self.dtype, name="point_emb_6")
        # final layer emits decoder-space embeddings (== in_channels in all
        # reference configs; decoupled here so shrunken test configs work)
        self.point_emb_8 = nn.Dense(
            self.decoder_config.hidden_size * num_sincos * self.per_pointset_point,
            dtype=self.dtype, name="point_emb_8",
        )
        self.no_mask_embed = nn.Embed(1, self.decoder_config.hidden_size, name="no_mask_embed")
        self.mask_decoder = SamMaskDecoder(config=self.decoder_config, dtype=self.dtype)

    def __call__(
        self,
        mask_feats: jax.Array,  # (B, R, roi, roi, C) per-image grouped RoI feats
        image_embeddings: jax.Array,  # (B, h, w, C)
        image_positional_embeddings: jax.Array,  # (B or 1, h, w, C)
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (low_res_masks (B, R, M, 4h, 4w), iou_preds (B, R, M))."""
        b, r = mask_feats.shape[:2]
        c = self.decoder_config.hidden_size
        x = mask_feats.reshape((b * r,) + mask_feats.shape[2:])
        x = self.point_emb_0(x)
        x = self.point_emb_1(x, use_running_average=not train)
        x = nn.relu(x)
        x = x.reshape(b * r, -1)
        # NB: torch flattens NCHW (C,H,W); ours flattens NHWC. The following
        # linear absorbs the permutation — the converter reorders its kernel
        # rows for checkpoint parity (see torch_convert._transform notes).
        x = nn.relu(self.point_emb_4(x))
        x = nn.relu(self.point_emb_6(x))
        x = self.point_emb_8(x)  # (B*R, K * C * num_sincos)

        k = self.per_pointset_point
        pts = x.reshape(b * r, k, -1)
        if self.with_sincos:
            pts = jnp.sin(pts[..., ::2]) + pts[..., 1::2]
        sparse = pts.reshape(b, r, k, c)

        h, w = image_embeddings.shape[1:3]
        dense = jnp.broadcast_to(
            self.no_mask_embed.embedding.reshape(1, 1, 1, -1),
            (b, h, w, self.decoder_config.hidden_size),
        )
        pe = image_positional_embeddings
        if pe.shape[0] != b:
            pe = jnp.broadcast_to(pe, (b,) + pe.shape[1:])
        masks, iou = self.mask_decoder(
            image_embeddings=image_embeddings,
            image_positional_embeddings=pe,
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=self.multimask_output,
        )
        return masks, iou
