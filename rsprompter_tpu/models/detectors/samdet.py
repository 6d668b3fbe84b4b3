"""SAM-det: trainable Faster R-CNN detector + frozen SAM box-prompt segmentor.

Behavior parity: reference ``SAMDet`` (``mmdet/rsprompter/models.py:1061-1215``):
``loss`` trains the detector only (:1085-1088); ``predict`` feeds detector
boxes as SAM box prompts (``multimask_output=False``) and thresholds the
decoded 256^2 masks (:1155-1215); ``oracle_predict`` substitutes GT boxes with
score 1 to measure the SAM upper bound (:1090-1160, toggled by
``test_cfg.oracle_on``).

TPU re-design: the two models share one jitted graph; the SAM encoder runs
once per image and the padded detection set (B, max_dets) rides the prompt
point_batch axis, so invalid det slots cost nothing extra and shapes never
change.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.backbones.resnet import ResNet
from rsprompter_tpu.models.dense_heads.rpn_head import (
    RPNHead,
    build_rpn_anchor_generator,
    rpn_loss,
    rpn_predict,
)
from rsprompter_tpu.models.necks.fpn import FPN
from rsprompter_tpu.models.roi_heads.standard_roi_head import StandardRoIHead
from rsprompter_tpu.models.preprocess import preprocess_images
from rsprompter_tpu.models.sam.configs import SamConfig, sam_config
from rsprompter_tpu.models.sam.sam import SamModel


class SAMDet(nn.Module):
    arch: str = "base"
    sam_cfg: Optional[SamConfig] = None  # overrides arch (tests)
    image_size: int = 1024
    num_classes: int = 1
    resnet_depth: int = 50
    rpn_scales: Tuple[float, ...] = (8,)
    rpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_samples: int = 512
    pos_fraction: float = 0.25
    train_cfg: Any = None
    test_cfg: Any = None
    attn_impl: str = "xla"
    dtype: Any = None

    def setup(self):
        self.backbone = ResNet(depth=self.resnet_depth, dtype=self.dtype)
        self.neck = FPN(out_channels=256, num_outs=5, dtype=self.dtype)
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
            with_mask=False,
            test_cfg=(self.test_cfg or {}).get("rcnn") if self.test_cfg else None,
            dtype=self.dtype,
        )
        cfg = self.sam_cfg or sam_config(self.arch, image_size=self.image_size)
        self.segmentor = SamModel(
            config=cfg, attn_impl=self.attn_impl, dtype=self.dtype
        )

    def _detector_feats(self, images):
        return self.neck(self.backbone(preprocess_images(images)))

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
        """Detector-only training; the segmentor is untouched (frozen)."""
        feats = self._detector_feats(batch["images"])
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
        losses.update(
            self.roi_head.loss(
                feats, proposals.boxes, proposals.valid,
                batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
                batch.get("gt_masks"), roi_rng,
            )
        )
        return losses

    def _decode_masks(self, images, boxes, valid):
        """SAM box-prompt decode: (B, N, 4) -> mask logits (B, N, 256-ish^2)."""
        images = preprocess_images(images)
        # degenerate padded boxes are harmless (masked downstream) but keep
        # them numerically sane
        safe_boxes = jnp.where(valid[..., None], boxes, jnp.asarray([0, 0, 1, 1], boxes.dtype))
        masks, iou = self.segmentor(
            pixel_values=images, input_boxes=safe_boxes, multimask_output=False
        )  # (B, N, 1, S, S)
        return masks[:, :, 0], iou[:, :, 0]

    def predict(self, batch: Dict[str, jax.Array]):
        feats = self._detector_feats(batch["images"])
        cls_scores, bbox_preds = self.rpn_head(feats)
        featmap_sizes = [f.shape[1:3] for f in feats]
        level_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        test_cfg = dict(self.test_cfg or {})
        rpn_cfg = dict(nms_pre=1000, max_per_img=1000, nms_iou_thr=0.7)
        rpn_cfg.update(test_cfg.get("rpn", {}))
        proposals = rpn_predict(
            cls_scores, bbox_preds, level_anchors, batch["img_shape"], rpn_cfg
        )
        dets, _ = self.roi_head.predict(
            feats, proposals.boxes, proposals.valid, batch["img_shape"]
        )
        mask_logits, _ = self._decode_masks(batch["images"], dets.boxes, dets.valid)
        # reference thresholds logits > 0 (== sigmoid > 0.5)
        mask_probs = jax.nn.sigmoid(mask_logits.astype(jnp.float32))
        return dets, mask_probs

    def tensor(self, batch: Dict[str, jax.Array]):
        """``mode='tensor'`` raw-outputs contract for the trainable
        detector half (the reference's SAMDet inherits the 3-mode dispatch
        from ``base.py:59-99``; its frozen segmentor has no tensor path):
        per-level RPN scores/deltas + raw RoI bbox head outputs."""
        feats = self._detector_feats(batch["images"])
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

    def oracle_predict(self, batch: Dict[str, jax.Array]):
        """GT boxes as prompts, score 1 — the paper's SAM upper bound."""
        from rsprompter_tpu.models.roi_heads.bbox_head import DetResult

        boxes = batch["gt_bboxes"]
        valid = batch["gt_valid"]
        dets = DetResult(
            boxes=boxes,
            scores=valid.astype(jnp.float32),
            labels=batch["gt_labels"].astype(jnp.int32),
            valid=valid,
        )
        mask_logits, _ = self._decode_masks(batch["images"], boxes, valid)
        return dets, jax.nn.sigmoid(mask_logits.astype(jnp.float32))
