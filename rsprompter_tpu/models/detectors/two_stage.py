"""Two-stage detectors: generic Mask R-CNN orchestration + SAM-seg variant.

Behavior parity: reference ``mmdet/models/detectors/two_stage.py:16`` /
``mask_rcnn.py:10`` and ``SAMSegMaskRCNN``
(``mmdet/rsprompter/models.py:1219-1244``): SAM ViT encoder hidden states ->
RSFPN neck -> RPN -> standard RoI head; backbone frozen unless PEFT
(``models.py:1228-1231``).

The 3-mode forward contract of the reference's ``BaseDetector``
(loss/predict/tensor, ``base.py:59-99``) maps to the ``loss``/``predict``
methods invoked via ``module.apply(..., method=...)``.
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
from rsprompter_tpu.models.roi_heads.standard_roi_head import StandardRoIHead
from rsprompter_tpu.models.preprocess import preprocess_images
from rsprompter_tpu.models.sam.configs import SamVisionConfig, sam_config
from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder


class SAMSegMaskRCNN(nn.Module):
    """Frozen SAM encoder + aggregator/FPN neck + Mask R-CNN heads."""

    arch: str = "base"  # sam vit arch or hf name
    vision_config: Optional[SamVisionConfig] = None  # overrides arch (tests)
    image_size: int = 1024
    num_classes: int = 1
    select_layers: Tuple[int, ...] = tuple(range(1, 13, 2))
    aggregator_type: str = "multi"  # 'multi' (RSFeatureAggregator) | 'pseudo'
    aggregator_hidden: int = 32
    rpn_scales: Tuple[float, ...] = (8,)
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_samples: int = 512
    pos_fraction: float = 0.25
    freeze_backbone: bool = True
    lora_rank: int = 0
    lora_alpha: float = 32.0
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
            feature_spliter=RSSimpleFPN(dtype=self.dtype, name="neck_feature_spliter"),
        )
        self.anchor_generator = build_rpn_anchor_generator(
            dict(scales=self.rpn_scales, strides=self.rpn_strides)
        )
        self.rpn_head = RPNHead(
            num_base_priors=self.anchor_generator.num_base_priors, dtype=self.dtype
        )
        self.roi_head = StandardRoIHead(
            num_classes=self.num_classes,
            featmap_strides=self.roi_strides,
            num_samples=self.num_samples,
            pos_fraction=self.pos_fraction,
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
        neck_in = (
            (image_embeddings,) if self.aggregator_type == "pseudo" else hidden_states
        )
        return self.neck(neck_in, train=train)

    def _rpn_cfgs(self):
        tc = dict(self.train_cfg or {})
        rpn_train = dict(
            pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
            num=256, pos_fraction=0.5,
        )
        rpn_train.update(tc.get("rpn", {}))
        rpn_proposal = dict(nms_pre=2000, max_per_img=1000, nms_iou_thr=0.7)
        rpn_proposal.update(tc.get("rpn_proposal", {}))
        return rpn_train, rpn_proposal

    def loss(self, batch: Dict[str, jax.Array], rng: jax.Array) -> Dict[str, jax.Array]:
        feats = self.extract_feat(batch["images"], train=True)
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
            batch["gt_masks"], roi_rng,
        )
        losses.update(roi_losses)
        return losses

    def predict(self, batch: Dict[str, jax.Array]):
        feats = self.extract_feat(batch["images"], train=False)
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
            feats, proposals.boxes, proposals.valid, batch["img_shape"]
        )
        return dets, mask_probs

    def tensor(self, batch: Dict[str, jax.Array]):
        """``mode='tensor'`` raw-outputs contract (reference
        ``base.py:59-99`` -> ``two_stage.py _forward``): per-level RPN
        scores/deltas + raw RoI head outputs on the NMS'd proposals."""
        feats = self.extract_feat(batch["images"], train=False)
        cls_scores, bbox_preds = self.rpn_head(feats)
        featmap_sizes = [f.shape[1:3] for f in feats]
        level_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        test_cfg = dict(self.test_cfg or {})
        rpn_cfg = dict(nms_pre=1000, max_per_img=1000, nms_iou_thr=0.7)
        rpn_cfg.update(test_cfg.get("rpn", {}))
        proposals = rpn_predict(
            cls_scores, bbox_preds, level_anchors, batch["img_shape"], rpn_cfg
        )
        roi_out = self.roi_head.tensor(feats, proposals.boxes)
        return (tuple(cls_scores), tuple(bbox_preds)) + roi_out
