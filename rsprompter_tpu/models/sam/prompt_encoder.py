"""SAM prompt encoder (flax, NHWC).

Parity target: HF ``SamPromptEncoder`` (wrapped by the reference at
``mmdet/rsprompter/models.py:882-896``). RSPrompter itself bypasses point/box
embedding — it predicts sparse embeddings directly — but harvests
``no_mask_embed`` / ``mask_embed`` (reference ``models.py:305-307,1635``);
SAM-det uses the full box-prompt path (reference ``models.py:1184-1188``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam.common import SamLayerNorm
from rsprompter_tpu.models.sam.configs import SamPromptEncoderConfig
from rsprompter_tpu.models.sam.positional import SamPositionalEmbedding


class SamMaskEmbedding(nn.Module):
    """Mask-prompt downscaler: 2x stride-2 convs + 1x1 conv, GELU, LN."""

    config: SamPromptEncoderConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, masks):
        """masks: (B, H, W, 1) at 4x the embedding resolution -> (B, h, w, C)."""
        cfg = self.config
        ch = cfg.mask_input_channels // 4
        x = nn.Conv(ch, (2, 2), strides=(2, 2), dtype=self.dtype, name="conv1")(masks)
        x = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            cfg.mask_input_channels, (2, 2), strides=(2, 2), dtype=self.dtype, name="conv2"
        )(x)
        x = SamLayerNorm(eps=cfg.layer_norm_eps, name="layer_norm2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(cfg.hidden_size, (1, 1), dtype=self.dtype, name="conv3")(x)


class SamPromptEncoder(nn.Module):
    """Points/boxes/masks -> (sparse, dense) prompt embeddings.

    Point labels: 1 foreground, 0 background, -1 not-a-point (replaced by
    ``not_a_point_embed``), -10 padding (zeroed).
    """

    config: SamPromptEncoderConfig
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        self.shared_embedding = SamPositionalEmbedding(
            num_pos_feats=cfg.hidden_size // 2, scale_init=cfg.hidden_size // 2
        )
        self.mask_embed = SamMaskEmbedding(config=cfg, dtype=self.dtype)
        self.no_mask_embed = nn.Embed(1, cfg.hidden_size, name="no_mask_embed")
        self.not_a_point_embed = nn.Embed(1, cfg.hidden_size, name="not_a_point_embed")
        self.point_embed = [
            nn.Embed(1, cfg.hidden_size, name=f"point_embed_{i}")
            for i in range(cfg.num_point_embeddings)
        ]

    def _embed_points(self, points, labels, pad: bool):
        """points (B, P, N, 2) pixel coords, labels (B, P, N) -> (B, P, N(+1), C)."""
        cfg = self.config
        points = points + 0.5  # pixel centers
        if pad:
            b, p = points.shape[:2]
            points = jnp.concatenate(
                [points, jnp.zeros((b, p, 1, 2), points.dtype)], axis=2
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, p, 1), labels.dtype)], axis=2
            )
        pe = self.shared_embedding(
            points, input_shape=(cfg.image_size, cfg.image_size)
        )
        lab = labels[..., None]
        pe = jnp.where(lab == -1, self.not_a_point_embed.embedding[0], pe)
        pe = jnp.where(lab == -10, jnp.zeros_like(pe), pe)
        pe = jnp.where(lab == 0, pe + self.point_embed[0].embedding[0], pe)
        pe = jnp.where(lab == 1, pe + self.point_embed[1].embedding[0], pe)
        return pe

    def _embed_boxes(self, boxes):
        """boxes (B, N, 4) xyxy pixel coords -> (B, N, 2, C)."""
        cfg = self.config
        boxes = boxes + 0.5
        b, n = boxes.shape[:2]
        coords = boxes.reshape(b, n, 2, 2)
        corner = self.shared_embedding(
            coords, input_shape=(cfg.image_size, cfg.image_size)
        )
        corner = corner.at[:, :, 0, :].add(self.point_embed[2].embedding[0])
        corner = corner.at[:, :, 1, :].add(self.point_embed[3].embedding[0])
        return corner

    def __call__(
        self,
        input_points: Optional[jax.Array] = None,
        input_labels: Optional[jax.Array] = None,
        input_boxes: Optional[jax.Array] = None,
        input_masks: Optional[jax.Array] = None,
    ) -> Tuple[Optional[jax.Array], jax.Array]:
        cfg = self.config
        sparse = None
        batch_size = 1
        if input_points is not None:
            batch_size = input_points.shape[0]
            if input_labels is None:
                raise ValueError("labels required with points")
            sparse = self._embed_points(
                input_points, input_labels, pad=input_boxes is None
            )
        if input_boxes is not None:
            batch_size = input_boxes.shape[0]
            box_emb = self._embed_boxes(input_boxes)
            sparse = box_emb if sparse is None else jnp.concatenate([sparse, box_emb], 2)
        if input_masks is not None:
            dense = self.mask_embed(input_masks)
        else:
            size = cfg.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.embedding.reshape(1, 1, 1, -1),
                (batch_size, size, size, cfg.hidden_size),
            )
        return sparse, dense
