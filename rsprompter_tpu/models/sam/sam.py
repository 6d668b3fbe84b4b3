"""Complete SAM model (encoder + prompt encoder + mask decoder), flax.

Parity target: HF ``SamModel`` as consumed by the reference's SAM-det
segmentor (``RSSamModel``, reference ``mmdet/rsprompter/models.py:719-741``;
predict path ``models.py:1184-1188``:
``segmentor(pixel_values, input_boxes, multimask_output=False)``).

The prompt-encoder's shared positional embedding is weight-tied to
``shared_image_embedding`` (same checkpoint tensor loaded into both).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam.configs import SamConfig
from rsprompter_tpu.models.sam.mask_decoder import SamMaskDecoder
from rsprompter_tpu.models.sam.positional import (
    SamPositionalEmbedding,
    image_wide_positional_embeddings,
)
from rsprompter_tpu.models.sam.prompt_encoder import SamPromptEncoder
from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder


class SamModel(nn.Module):
    config: SamConfig
    attn_impl: str = "xla"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        self.shared_image_embedding = SamPositionalEmbedding(
            num_pos_feats=cfg.vision_config.num_pos_feats,
            scale_init=cfg.prompt_encoder_config.hidden_size // 2,
        )
        self.vision_encoder = SamVisionEncoder(
            config=cfg.vision_config, attn_impl=self.attn_impl, dtype=self.dtype
        )
        self.prompt_encoder = SamPromptEncoder(
            config=cfg.prompt_encoder_config, dtype=self.dtype
        )
        self.mask_decoder = SamMaskDecoder(
            config=cfg.mask_decoder_config, dtype=self.dtype
        )

    def get_image_wide_positional_embeddings(self):
        size = self.config.prompt_encoder_config.image_embedding_size
        return image_wide_positional_embeddings(self.shared_image_embedding, size)

    def get_image_embeddings(self, pixel_values):
        """pixel_values NHWC -> (B, h, w, 256)."""
        neck_out, _ = self.vision_encoder(pixel_values)
        return neck_out

    def __call__(
        self,
        pixel_values: Optional[jax.Array] = None,
        input_points: Optional[jax.Array] = None,
        input_labels: Optional[jax.Array] = None,
        input_boxes: Optional[jax.Array] = None,
        input_masks: Optional[jax.Array] = None,
        image_embeddings: Optional[jax.Array] = None,
        multimask_output: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (pred_masks (B, P, M, 256, 256), iou_scores (B, P, M))."""
        if (pixel_values is None) == (image_embeddings is None):
            raise ValueError("Provide exactly one of pixel_values / image_embeddings")
        if pixel_values is not None:
            image_embeddings = self.get_image_embeddings(pixel_values)
        b = image_embeddings.shape[0]

        image_pe = self.get_image_wide_positional_embeddings()  # (1, s, s, C)
        image_pe = jnp.broadcast_to(image_pe, (b,) + image_pe.shape[1:])

        if input_points is not None and input_labels is None:
            input_labels = jnp.ones(input_points.shape[:-1], jnp.int32)

        sparse, dense = self.prompt_encoder(
            input_points=input_points,
            input_labels=input_labels,
            input_boxes=input_boxes,
            input_masks=input_masks,
        )
        masks, iou = self.mask_decoder(
            image_embeddings=image_embeddings,
            image_positional_embeddings=image_pe,
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=multimask_output,
        )
        return masks, iou
