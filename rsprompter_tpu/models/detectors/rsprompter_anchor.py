"""RSPrompter anchor-variant detector.

Behavior parity: reference ``RSPrompterAnchor``
(``mmdet/rsprompter/models.py:54-170``): SAM ViT encoder -> (FPN feats,
image_embeddings, image-wide Fourier PE) -> RPN -> RoI prompt head with SAM
embeddings threaded through. Freeze sets (:66-75): backbone iff no PEFT;
``decoder_freeze`` adds shared PE + mask decoder + no_mask_embed (enforced
here via optimizer masks, see ``engine.optim.build_param_label_fn``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.dense_heads.rpn_head import (
    RPNHead,
    build_rpn_anchor_generator,
    rpn_loss,
    rpn_predict,
)
from rsprompter_tpu.models.necks.rsfpn import (
    RSFPN,
    PseudoFeatureAggregator,
    RSFeatureAggregator,
    RSSimpleFPN,
)
from rsprompter_tpu.models.roi_heads.prompt_roi_head import RSPrompterAnchorRoIPromptHead
from rsprompter_tpu.models.preprocess import preprocess_images
from rsprompter_tpu.models.sam.configs import SamVisionConfig, sam_config
from rsprompter_tpu.models.sam.positional import (
    SamPositionalEmbedding,
    image_wide_positional_embeddings,
)
from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder


class RSPrompterAnchor(nn.Module):
    arch: str = "base"
    vision_config: Optional[SamVisionConfig] = None
    image_size: int = 1024
    num_classes: int = 1
    prompt_shape: Tuple[int, int] = (100, 5)  # (pointsets, points per set)
    select_layers: Tuple[int, ...] = tuple(range(1, 13, 2))
    aggregator_type: str = "multi"  # 'multi' (RSFeatureAggregator) | 'pseudo'
    aggregator_hidden: int = 32
    rpn_scales: Tuple[float, ...] = (4, 8)
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_samples: int = 256
    pos_fraction: float = 0.25
    with_extra_pe: bool = True
    with_sincos: bool = True
    multimask_output: bool = False
    decoder_freeze: bool = True
    freeze_backbone: bool = True
    lora_rank: int = 0
    lora_alpha: float = 32.0
    mask_loss_resolution: str = "full"
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
        full_cfg = sam_config("base") if self.vision_config is not None else sam_config(self.arch)
        self.backbone = SamVisionEncoder(
            config=vcfg, attn_impl=self.attn_impl,
            lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            safe_softmax=self.safe_softmax,
            dtype=self.dtype,
        )
        self.shared_image_embedding = SamPositionalEmbedding(
            num_pos_feats=vcfg.output_channels // 2,
            scale_init=vcfg.output_channels // 2,
        )
        decoder_cfg = full_cfg.mask_decoder_config
        if vcfg.output_channels != decoder_cfg.hidden_size:
            import dataclasses

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
        self.anchor_generator = build_rpn_anchor_generator(
            dict(scales=self.rpn_scales, strides=self.rpn_strides)
        )
        self.rpn_head = RPNHead(
            num_base_priors=self.anchor_generator.num_base_priors, dtype=self.dtype
        )
        self.roi_head = RSPrompterAnchorRoIPromptHead(
            decoder_config=decoder_cfg,
            num_classes=self.num_classes,
            featmap_strides=self.roi_strides,
            num_samples=self.num_samples,
            pos_fraction=self.pos_fraction,
            with_extra_pe=self.with_extra_pe,
            per_pointset_point=self.prompt_shape[1],
            with_sincos=self.with_sincos,
            multimask_output=self.multimask_output,
            decoder_freeze=self.decoder_freeze,
            mask_loss_resolution=self.mask_loss_resolution,
            test_cfg=(self.test_cfg or {}).get("rcnn") if self.test_cfg else None,
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
        image_pe = image_wide_positional_embeddings(
            self.shared_image_embedding, image_embeddings.shape[1]
        )  # (1, s, s, C)
        neck_in = (
            (image_embeddings,) if self.aggregator_type == "pseudo" else hidden_states
        )
        feats = self.neck(neck_in, train=train)
        return feats, image_embeddings, image_pe

    def _rpn_cfgs(self):
        tc = dict(self.train_cfg or {})
        rpn_train = dict(
            pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3, num=256,
            pos_fraction=0.5,
        )
        rpn_train.update(tc.get("rpn", {}))
        rpn_proposal = dict(nms_pre=2000, max_per_img=1000, nms_iou_thr=0.7)
        rpn_proposal.update(tc.get("rpn_proposal", {}))
        return rpn_train, rpn_proposal

    def loss(self, batch: Dict[str, jax.Array], rng: jax.Array) -> Dict[str, jax.Array]:
        feats, image_embeddings, image_pe = self.extract_feat(
            batch["images"], train=True
        )
        cls_scores, bbox_preds = self.rpn_head(feats)
        featmap_sizes = [f.shape[1:3] for f in feats]
        anchors = jnp.asarray(self.anchor_generator.flat_anchors(featmap_sizes))
        level_anchors = self.anchor_generator.grid_anchors(featmap_sizes)

        rpn_rng, roi_rng = jax.random.split(rng)
        rpn_train_cfg, rpn_proposal_cfg = self._rpn_cfgs()
        losses = rpn_loss(
            cls_scores, bbox_preds, anchors,
            batch["gt_bboxes"], batch["gt_valid"], rpn_rng, rpn_train_cfg,
        )
        proposals = rpn_predict(
            [jax.lax.stop_gradient(s) for s in cls_scores],
            [jax.lax.stop_gradient(d) for d in bbox_preds],
            level_anchors, batch["img_shape"], rpn_proposal_cfg,
        )
        roi_losses = self.roi_head.loss(
            feats, proposals.boxes, proposals.valid,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
            batch["gt_masks"], image_embeddings, image_pe, roi_rng,
        )
        losses.update(roi_losses)
        return losses

    def predict(self, batch: Dict[str, jax.Array]):
        feats, image_embeddings, image_pe = self.extract_feat(
            batch["images"], train=False
        )
        cls_scores, bbox_preds = self.rpn_head(feats)
        featmap_sizes = [f.shape[1:3] for f in feats]
        level_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        test_cfg = dict(self.test_cfg or {})
        rpn_cfg = dict(nms_pre=1000, max_per_img=1000, nms_iou_thr=0.7)
        rpn_cfg.update(test_cfg.get("rpn", {}))
        proposals = rpn_predict(
            cls_scores, bbox_preds, level_anchors, batch["img_shape"], rpn_cfg
        )
        dets, mask_probs = self.roi_head.predict(
            feats, proposals.boxes, proposals.valid, batch["img_shape"],
            image_embeddings, image_pe,
        )
        return dets, mask_probs

    def tensor(self, batch: Dict[str, jax.Array]):
        """``mode='tensor'`` of the reference 3-mode forward contract
        (``mmdet/models/detectors/base.py:59-99`` -> ``two_stage.py
        _forward``): per-level RPN scores/deltas, then RAW RoI head outputs
        on the NMS'd proposals — no box decode, no score threshold, no mask
        postprocess. Feeds flops counting / graph export."""
        feats, image_embeddings, image_pe = self.extract_feat(
            batch["images"], train=False
        )
        cls_scores, bbox_preds = self.rpn_head(feats)
        featmap_sizes = [f.shape[1:3] for f in feats]
        level_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        test_cfg = dict(self.test_cfg or {})
        rpn_cfg = dict(nms_pre=1000, max_per_img=1000, nms_iou_thr=0.7)
        rpn_cfg.update(test_cfg.get("rpn", {}))
        proposals = rpn_predict(
            cls_scores, bbox_preds, level_anchors, batch["img_shape"], rpn_cfg
        )
        roi_out = self.roi_head.tensor(
            feats, proposals.boxes, image_embeddings, image_pe
        )
        return (tuple(cls_scores), tuple(bbox_preds)) + roi_out
