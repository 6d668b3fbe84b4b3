"""RSPrompter query-variant detector + SAM-seg Mask2Former.

Behavior parity: reference ``RSPrompterQuery``
(``mmdet/rsprompter/models.py:174-272``): SAM encoder -> RSFPN -> RSMask2Former
head (per-layer SAM decode) -> fusion head; freeze sets: backbone iff no PEFT,
``decoder_freeze`` adds shared PE + SAM mask decoder. ``SAMSegMask2Former``
(``models.py:1248-1274``) is the stock-head variant of the same pipeline.

GT masks for the query losses are at batch-input resolution; predictions are
emitted as padded top-100 instances + sigmoid mask probs (full-frame), with
the ori-resolution crop/rescale in the shared host postprocess.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax

from rsprompter_tpu.models.dense_heads.mask2former_head import Mask2FormerHead
from rsprompter_tpu.models.necks.rsfpn import (
    RSFPN,
    PseudoFeatureAggregator,
    RSFeatureAggregator,
    RSSimpleFPN,
)
from rsprompter_tpu.models.preprocess import preprocess_images
from rsprompter_tpu.models.sam.configs import SamVisionConfig, sam_config
from rsprompter_tpu.models.sam.positional import (
    SamPositionalEmbedding,
    image_wide_positional_embeddings,
)
from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder
from rsprompter_tpu.models.seg_heads.fusion_head import instance_postprocess


class RSPrompterQuery(nn.Module):
    arch: str = "base"
    vision_config: Optional[SamVisionConfig] = None
    image_size: int = 1024
    num_classes: int = 1
    prompt_shape: Tuple[int, int] = (100, 5)
    select_layers: Tuple[int, ...] = tuple(range(1, 13, 2))
    aggregator_type: str = "multi"  # 'multi' (RSFeatureAggregator) | 'pseudo'
    aggregator_hidden: int = 32
    feat_channels: int = 128
    decoder_plus: bool = True
    with_sincos: bool = True
    decoder_freeze: bool = True
    freeze_backbone: bool = True
    lora_rank: int = 0
    lora_alpha: float = 32.0
    num_decoder_layers: int = 6
    sam_prompting: bool = True  # False -> SAMSegMask2Former behavior
    max_per_image: int = 100
    train_cfg: Any = None
    test_cfg: Any = None
    attn_impl: str = "xla"
    safe_softmax: bool = False  # exact softmax in fused attention (enable
    # when the encoder trains from scratch; see SamVisionEncoder)
    dtype: Any = None

    def setup(self):
        if self.vision_config is not None:
            vcfg = self.vision_config
        else:
            vcfg = sam_config(self.arch, image_size=self.image_size).vision_config
        self.backbone = SamVisionEncoder(
            config=vcfg, attn_impl=self.attn_impl,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            safe_softmax=self.safe_softmax,
            dtype=self.dtype,
        )
        if self.sam_prompting:
            self.shared_image_embedding = SamPositionalEmbedding(
                num_pos_feats=vcfg.output_channels // 2,
                scale_init=vcfg.output_channels // 2,
            )
        decoder_cfg = sam_config("base").mask_decoder_config
        if vcfg.output_channels != decoder_cfg.hidden_size:
            decoder_cfg = dataclasses.replace(
                decoder_cfg, hidden_size=vcfg.output_channels
            )
        if self.aggregator_type == "pseudo":
            aggregator = PseudoFeatureAggregator(
                hidden_channels=max(self.aggregator_hidden, 64),
                dtype=self.dtype,
                name="neck_feature_aggregator",
            )
        else:
            aggregator = RSFeatureAggregator(
                in_channels=self.arch,
                hidden_channels=self.aggregator_hidden,
                select_layers=self.select_layers,
                num_layers=vcfg.num_hidden_layers,
                dtype=self.dtype,
                name="neck_feature_aggregator",
            )
        self.neck = RSFPN(
            feature_aggregator=aggregator,
            feature_spliter=RSSimpleFPN(
                backbone_channel=256, dtype=self.dtype, name="neck_feature_spliter"
            ),
        )
        tc = dict(self.train_cfg or {})
        self.panoptic_head = Mask2FormerHead(
            num_classes=self.num_classes,
            num_queries=self.prompt_shape[0],
            feat_channels=self.feat_channels,
            out_channels=vcfg.output_channels,
            num_decoder_layers=self.num_decoder_layers,
            sam_prompting=self.sam_prompting,
            decoder_config=decoder_cfg,
            decoder_plus=self.decoder_plus,
            per_pointset_point=self.prompt_shape[1],
            with_sincos=self.with_sincos,
            num_points=tc.get("num_points", 12544),
            oversample_ratio=tc.get("oversample_ratio", 3.0),
            importance_sample_ratio=tc.get("importance_sample_ratio", 0.75),
            dtype=self.dtype,
        )

    def extract_feat(self, images: jax.Array, train: bool = False):
        images = preprocess_images(images)
        image_embeddings, hidden_states = self.backbone(images)
        if self.freeze_backbone:
            image_embeddings = jax.lax.stop_gradient(image_embeddings)
            hidden_states = jax.tree_util.tree_map(
                jax.lax.stop_gradient, hidden_states
            )
        image_pe = None
        if self.sam_prompting:
            image_pe = image_wide_positional_embeddings(
                self.shared_image_embedding, image_embeddings.shape[1]
            )
        neck_in = (
            (image_embeddings,) if self.aggregator_type == "pseudo" else hidden_states
        )
        feats = self.neck(neck_in, train=train)
        return feats, image_embeddings, image_pe

    def loss(self, batch: Dict[str, jax.Array], rng: jax.Array) -> Dict[str, jax.Array]:
        feats, image_embeddings, image_pe = self.extract_feat(
            batch["images"], train=True
        )
        return self.panoptic_head.loss(
            feats,
            batch["gt_labels"],
            batch["gt_masks"],
            batch["gt_valid"],
            rng,
            image_embeddings=image_embeddings,
            image_pe=image_pe,
        )

    def predict(self, batch: Dict[str, jax.Array]):
        feats, image_embeddings, image_pe = self.extract_feat(
            batch["images"], train=False
        )
        cls_pred, mask_pred = self.panoptic_head.predict(
            feats, image_embeddings, image_pe
        )
        # boxes in batch-input pixel coords: masks are at stride
        # input_h / mask_h relative to the padded input
        in_h = batch["images"].shape[1]
        scale = in_h / mask_pred.shape[-2]
        tcfg = dict(self.test_cfg or {})
        max_per_image = tcfg.get("max_per_image", self.max_per_image)

        def per_image(cl, mp):
            return instance_postprocess(
                cl, mp, self.num_classes, max_per_image, scale_boxes=scale
            )

        dets, mask_probs = jax.vmap(per_image)(cls_pred, mask_pred)
        return dets, mask_probs

    def tensor(self, batch: Dict[str, jax.Array]):
        """``mode='tensor'`` of the reference 3-mode forward contract
        (``base.py:59-99`` -> ``maskformer.py _forward``): every decoder
        layer's raw class logits and mask logits, no fusion-head
        postprocess. Returns (cls_list, mask_list) tuples, one entry per
        decoder layer (+1 for the pre-decoder head)."""
        feats, image_embeddings, image_pe = self.extract_feat(
            batch["images"], train=False
        )
        cls_list, mask_list, _, _ = self.panoptic_head(
            feats, image_embeddings, image_pe
        )
        return tuple(cls_list), tuple(mask_list)


class SAMSegMask2Former(RSPrompterQuery):
    """Stock Mask2Former head on SAM features (reference ``models.py:1248``)."""

    sam_prompting: bool = False
    decoder_plus: bool = False
