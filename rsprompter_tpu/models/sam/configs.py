"""SAM architecture configs (ViT-B/L/H) as plain dataclasses.

Arch parameters match the HF ``facebook/sam-vit-{base,large,huge}`` checkpoints
consumed by the reference (reference ``mmdet/rsprompter/models.py:763-809``
builds ``SamVisionEncoder`` from ``SamConfig.from_pretrained``; mirrored arch
table at reference ``mmpretrain/models/backbones/vit_sam.py:377-402``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SamVisionConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    image_size: int = 1024
    patch_size: int = 16
    num_channels: int = 3
    output_channels: int = 256
    window_size: int = 14
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    num_pos_feats: int = 128

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class SamPromptEncoderConfig:
    hidden_size: int = 256
    image_size: int = 1024
    patch_size: int = 16
    mask_input_channels: int = 16
    num_point_embeddings: int = 4
    layer_norm_eps: float = 1e-6

    @property
    def image_embedding_size(self) -> int:
        return self.image_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class SamMaskDecoderConfig:
    hidden_size: int = 256
    num_hidden_layers: int = 2
    num_attention_heads: int = 8
    mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    attention_downsample_rate: int = 2
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SamConfig:
    vision_config: SamVisionConfig = dataclasses.field(default_factory=SamVisionConfig)
    prompt_encoder_config: SamPromptEncoderConfig = dataclasses.field(
        default_factory=SamPromptEncoderConfig
    )
    mask_decoder_config: SamMaskDecoderConfig = dataclasses.field(
        default_factory=SamMaskDecoderConfig
    )


_VISION_ARCHES = {
    "base": dict(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        global_attn_indexes=(2, 5, 8, 11),
    ),
    "large": dict(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        global_attn_indexes=(5, 11, 17, 23),
    ),
    "huge": dict(
        hidden_size=1280, num_hidden_layers=32, num_attention_heads=16,
        global_attn_indexes=(7, 15, 23, 31),
    ),
}


def sam_config(arch: str = "base", image_size: int = 1024, **overrides) -> SamConfig:
    """Build a SamConfig for ``facebook/sam-vit-{arch}``.

    ``arch`` accepts 'base'/'large'/'huge' or the HF repo names the reference
    configs use (e.g. 'facebook/sam-vit-base').
    """
    key = arch.split("-")[-1] if "/" in arch or "-" in arch else arch
    if key not in _VISION_ARCHES:
        raise ValueError(f"Unknown SAM arch '{arch}'")
    vision = SamVisionConfig(image_size=image_size, **_VISION_ARCHES[key], **overrides)
    return SamConfig(
        vision_config=vision,
        prompt_encoder_config=SamPromptEncoderConfig(image_size=image_size),
        mask_decoder_config=SamMaskDecoderConfig(),
    )
