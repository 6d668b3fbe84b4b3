"""Shared-2FC bbox head + masked loss/predict (flax).

Behavior parity: reference
``mmdet/models/roi_heads/bbox_heads/convfc_bbox_head.py:221`` (Shared2FCBBoxHead):
flatten RoI feats -> 2x 1024 FC -> cls (C+1 softmax) & reg (C*4,
class-specific, stds [.1,.1,.2,.2]); test-time per-class NMS
(score_thr .05, iou .5, max 100 — ``_base_/rsprompter_anchor.py`` rcnn test_cfg).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.losses import cross_entropy, smooth_l1
from rsprompter_tpu.ops.boxes import DeltaXYWHBBoxCoder
from rsprompter_tpu.ops.nms import batched_nms


class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 1
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, roi_feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """roi_feats (R, h, w, C) -> (cls_logits (R, C+1), bbox_deltas (R, C*4))."""
        r = roi_feats.shape[0]
        x = roi_feats.reshape(r, -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype, name="shared_fcs_0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype, name="shared_fcs_1")(x))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="fc_cls")(x)
        reg_dim = 4 if self.reg_class_agnostic else self.num_classes * 4
        bbox_deltas = nn.Dense(reg_dim, dtype=self.dtype, name="fc_reg")(x)
        return cls_logits, bbox_deltas


def bbox_head_loss(
    cls_logits: jax.Array,  # (R, C+1)
    bbox_deltas: jax.Array,  # (R, C*4)
    sampled_boxes: jax.Array,  # (R, 4) proposal boxes
    labels: jax.Array,  # (R,) gt class for pos, C (bg) for neg
    matched_gt_boxes: jax.Array,  # (R, 4)
    valid: jax.Array,  # (R,) sampled-slot validity
    is_pos: jax.Array,  # (R,)
    num_classes: int,
    target_stds=(0.1, 0.1, 0.2, 0.2),
    reg_class_agnostic: bool = False,
) -> Dict[str, jax.Array]:
    coder = DeltaXYWHBBoxCoder(target_stds=target_stds)
    avg = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    vw = valid.astype(jnp.float32)
    loss_cls = cross_entropy(cls_logits, labels, weight=vw, avg_factor=avg)

    targets = coder.encode(sampled_boxes, matched_gt_boxes)
    if reg_class_agnostic:
        pred = bbox_deltas
    else:
        pred = bbox_deltas.reshape(-1, num_classes, 4)
        idx = jnp.clip(labels, 0, num_classes - 1)
        pred = jnp.take_along_axis(pred, idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    pw = (is_pos & valid).astype(jnp.float32)[:, None]
    loss_bbox = smooth_l1(pred, targets, beta=1.0, weight=pw, avg_factor=avg)
    from rsprompter_tpu.models.losses import accuracy

    return {
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "acc": accuracy(cls_logits, labels, valid),
    }


class DetResult(NamedTuple):
    boxes: jax.Array  # (N, 4)
    scores: jax.Array  # (N,)
    labels: jax.Array  # (N,) int32
    valid: jax.Array  # (N,) bool


def bbox_head_predict_single(
    cls_logits: jax.Array,  # (R, C+1)
    bbox_deltas: jax.Array,  # (R, C*4) or (R, 4)
    proposals: jax.Array,  # (R, 4)
    proposal_valid: jax.Array,  # (R,)
    img_shape: jax.Array,  # (2,) (h, w)
    num_classes: int,
    cfg: Dict[str, Any],
    target_stds=(0.1, 0.1, 0.2, 0.2),
    reg_class_agnostic: bool = False,
) -> DetResult:
    """Per-image multiclass decode + NMS with static shapes."""
    score_thr = cfg.get("score_thr", 0.05)
    iou_thr = cfg.get("nms_iou_thr", 0.5)
    max_per_img = cfg.get("max_per_img", 100)

    coder = DeltaXYWHBBoxCoder(target_stds=target_stds)
    scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[:, :num_classes]
    r = proposals.shape[0]
    if reg_class_agnostic:
        boxes = coder.decode(proposals, bbox_deltas)  # (R, 4)
        boxes = jnp.broadcast_to(boxes[:, None, :], (r, num_classes, 4))
    else:
        deltas = bbox_deltas.reshape(r, num_classes, 4)
        boxes = coder.decode(proposals[:, None, :], deltas)
    hw = img_shape.astype(boxes.dtype)
    boxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, hw[1]),
            jnp.clip(boxes[..., 1], 0, hw[0]),
            jnp.clip(boxes[..., 2], 0, hw[1]),
            jnp.clip(boxes[..., 3], 0, hw[0]),
        ],
        axis=-1,
    )

    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = scores.reshape(-1)
    flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (r,))
    flat_valid = (
        jnp.repeat(proposal_valid, num_classes) & (flat_scores > score_thr)
    )

    # Score top-k prefilter before the per-class NMS. The flat candidate pool
    # is R*C (10,000 for NWPU's 1000 proposals x 10 classes) and the padded
    # NMS materializes an (N, N) IoU matrix — 400 MB at N=10k. Greedy NMS is
    # invariant to dropping candidates that can never be emitted: suppression
    # only ever flows from higher-scored to lower-scored boxes, so taking the
    # top `nms_pre` by score changes nothing unless more than nms_pre
    # candidates clear score_thr AND one ranked below the cut survives into
    # the top max_per_img — which would need >nms_pre-max_per_img mutually
    # suppressing higher-scored boxes. Default 0 = exact mode (reference
    # semantics: mmcv multiclass_nms has no cap); the shipped configs opt in
    # with rcnn nms_pre=2000 (ADVICE r4: the prefilter is a config decision,
    # not a silent code default).
    nms_pre = cfg.get("nms_pre", 0)
    if nms_pre and flat_scores.shape[0] > nms_pre:
        neg_inf = jnp.asarray(-jnp.inf, flat_scores.dtype)
        ranked = jnp.where(flat_valid, flat_scores, neg_inf)
        _, top_i = jax.lax.top_k(ranked, nms_pre)
        flat_boxes = flat_boxes[top_i]
        flat_scores = flat_scores[top_i]
        flat_labels = flat_labels[top_i]
        flat_valid = flat_valid[top_i]

    idx, keep, out_boxes, out_scores = batched_nms(
        flat_boxes, flat_scores, flat_labels,
        iou_thr=iou_thr, max_out=max_per_img, valid=flat_valid,
    )
    out_labels = jnp.where(keep, flat_labels[idx], 0)
    return DetResult(out_boxes, out_scores, out_labels, keep)
