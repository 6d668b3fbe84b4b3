"""RPN head: class-agnostic anchor proposals (flax + pure loss/predict fns).

Behavior parity: reference ``mmdet/models/dense_heads/rpn_head.py:22`` with
decode+NMS from ``base_dense_head.py:201,291,430`` and the RSPrompter config
(scales [4,8], ratios [.5,1,2], strides [4..64], sigmoid CE + SmoothL1,
sampler 256 @ 0.5 pos fraction, proposal NMS 0.7 -> top 1000).

TPU re-design: all anchors of all levels are one flat constant tensor; targets
are dense (per-anchor weights) so the loss is a single masked reduction; the
proposal path does static per-level top-k -> global top-k -> padded NMS,
returning (B, max_per_img, 4) + validity mask. Per-level NMS separation is
preserved via level-id batched NMS, matching ``_predict_by_feat_single``.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.models.losses import binary_cross_entropy, smooth_l1
from rsprompter_tpu.models.task_modules.anchor_generator import AnchorGenerator
from rsprompter_tpu.models.task_modules.assigners import max_iou_assign
from rsprompter_tpu.models.task_modules.samplers import random_sample_padded
from rsprompter_tpu.ops.boxes import DeltaXYWHBBoxCoder
from rsprompter_tpu.ops.nms import batched_nms


class RPNHead(nn.Module):
    """3x3 conv + ReLU -> 1x1 cls (A) & 1x1 reg (A*4), applied per level."""

    in_channels: int = 256
    feat_channels: int = 256
    num_base_priors: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype, name="rpn_conv")
        cls = nn.Conv(self.num_base_priors, (1, 1), dtype=self.dtype, name="rpn_cls")
        reg = nn.Conv(self.num_base_priors * 4, (1, 1), dtype=self.dtype, name="rpn_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            y = nn.relu(conv(x))
            cls_scores.append(cls(y))
            bbox_preds.append(reg(y))
        return cls_scores, bbox_preds


class Proposals(NamedTuple):
    boxes: jax.Array  # (B, N, 4)
    scores: jax.Array  # (B, N)
    valid: jax.Array  # (B, N) bool


def _flatten_outputs(cls_scores, bbox_preds):
    """Per-level NHWA maps -> flat (B, P) scores and (B, P, 4) deltas."""
    b = cls_scores[0].shape[0]
    scores = jnp.concatenate(
        [s.reshape(b, -1) for s in cls_scores], axis=1
    )
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1
    )
    return scores, deltas


def rpn_loss(
    cls_scores: List[jax.Array],
    bbox_preds: List[jax.Array],
    anchors: jax.Array,  # (P, 4) trace-time constant
    gt_bboxes: jax.Array,  # (B, G, 4)
    gt_valid: jax.Array,  # (B, G)
    rng: jax.Array,
    cfg: Dict[str, Any],
) -> Dict[str, jax.Array]:
    scores, deltas = _flatten_outputs(cls_scores, bbox_preds)
    b, p = scores.shape
    coder = DeltaXYWHBBoxCoder(
        cfg.get("target_means", (0, 0, 0, 0)), cfg.get("target_stds", (1, 1, 1, 1))
    )

    def per_image(key, gtb, gtv):
        assign = max_iou_assign(
            anchors,
            gtb,
            jnp.zeros(gtb.shape[0], jnp.int32),
            gtv,
            pos_iou_thr=cfg.get("pos_iou_thr", 0.7),
            neg_iou_thr=cfg.get("neg_iou_thr", 0.3),
            min_pos_iou=cfg.get("min_pos_iou", 0.3),
        )
        sample = random_sample_padded(
            key, assign.gt_inds, num=cfg.get("num", 256),
            pos_fraction=cfg.get("pos_fraction", 0.5),
        )
        label_w = jnp.zeros(p).at[sample.inds].max(sample.valid.astype(jnp.float32))
        pos_at_inds = sample.is_pos.astype(jnp.float32)
        pos_w = jnp.zeros(p).at[sample.inds].max(pos_at_inds)
        cls_target = jnp.zeros(p).at[sample.inds].max(pos_at_inds)
        matched_gt = gtb[jnp.clip(assign.gt_inds - 1, 0, gtb.shape[0] - 1)]
        bbox_target = coder.encode(anchors, matched_gt)
        return label_w, cls_target, pos_w, bbox_target, sample.valid.sum()

    keys = jax.random.split(rng, b)
    label_w, cls_t, pos_w, bbox_t, n_samp = jax.vmap(per_image)(
        keys, gt_bboxes, gt_valid
    )
    avg = jnp.maximum(n_samp.sum().astype(jnp.float32), 1.0)
    loss_cls = binary_cross_entropy(scores, cls_t, weight=label_w, avg_factor=avg)
    loss_bbox = smooth_l1(
        deltas, bbox_t, beta=cfg.get("smooth_l1_beta", 1.0),
        weight=pos_w[..., None], avg_factor=avg,
    )
    return {"loss_rpn_cls": loss_cls, "loss_rpn_bbox": loss_bbox}


def rpn_predict(
    cls_scores: List[jax.Array],
    bbox_preds: List[jax.Array],
    level_anchors: List[np.ndarray],
    img_shapes: jax.Array,  # (B, 2) valid (h, w) per image
    cfg: Dict[str, Any],
) -> Proposals:
    """Decode + per-level-separated NMS -> padded proposals."""
    nms_pre = cfg.get("nms_pre", 1000)
    max_per_img = cfg.get("max_per_img", 1000)
    iou_thr = cfg.get("nms_iou_thr", 0.7)
    pre_nms_total = cfg.get("pre_nms_total", 2000)

    b = cls_scores[0].shape[0]
    coder = DeltaXYWHBBoxCoder()

    cand_scores, cand_boxes, cand_levels = [], [], []
    for lvl, (score_map, delta_map, anchors) in enumerate(
        zip(cls_scores, bbox_preds, level_anchors)
    ):
        s = jax.nn.sigmoid(score_map.reshape(b, -1).astype(jnp.float32))
        d = delta_map.reshape(b, -1, 4)
        k = min(nms_pre, s.shape[1])
        top_s, top_i = jax.lax.top_k(s, k)
        top_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        top_a = jnp.asarray(anchors)[top_i]
        boxes = coder.decode(top_a, top_d)
        cand_scores.append(top_s)
        cand_boxes.append(boxes)
        cand_levels.append(jnp.full((b, k), lvl, jnp.int32))

    scores = jnp.concatenate(cand_scores, axis=1)
    boxes = jnp.concatenate(cand_boxes, axis=1)
    levels = jnp.concatenate(cand_levels, axis=1)

    # clip to per-image valid region
    hw = img_shapes.astype(boxes.dtype)
    boxes = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, hw[:, None, 1]),
            jnp.clip(boxes[..., 1], 0, hw[:, None, 0]),
            jnp.clip(boxes[..., 2], 0, hw[:, None, 1]),
            jnp.clip(boxes[..., 3], 0, hw[:, None, 0]),
        ],
        axis=-1,
    )

    k = min(pre_nms_total, scores.shape[1])
    top_s, top_i = jax.lax.top_k(scores, k)
    top_b = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    top_l = jnp.take_along_axis(levels, top_i, axis=1)

    min_sz = cfg.get("min_bbox_size", 0)
    wh_valid = (
        (top_b[..., 2] - top_b[..., 0] > min_sz)
        & (top_b[..., 3] - top_b[..., 1] > min_sz)
    )

    def per_image(bx, sc, lv, vd):
        _, keep, ob, os_ = batched_nms(
            bx, sc, lv, iou_thr=iou_thr, max_out=max_per_img, valid=vd
        )
        return ob, os_, keep

    ob, os_, keep = jax.vmap(per_image)(top_b, top_s, top_l, wh_valid)
    return Proposals(ob, os_, keep)


def build_rpn_anchor_generator(cfg: Dict[str, Any]) -> AnchorGenerator:
    return AnchorGenerator(
        strides=cfg.get("strides", (4, 8, 16, 32, 64)),
        ratios=cfg.get("ratios", (0.5, 1.0, 2.0)),
        scales=cfg.get("scales", (4, 8)),
    )
