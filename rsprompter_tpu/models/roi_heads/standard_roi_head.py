"""Standard two-stage RoI head (bbox + mask) with static-shape sampling.

Behavior parity: reference ``mmdet/models/roi_heads/standard_roi_head.py:17``
driven by the SAM-seg config (assign 0.5/0.5, sample 512 @ 0.25 with
``add_gt_as_proposals``, mask targets 28^2).

TPU re-design: assignment/sampling vmapped per image into fixed-size index
tensors (positives packed first), heads run once over the flattened
(B*num_samples) RoI batch, losses are masked reductions.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.roi_heads.bbox_head import (
    DetResult,
    Shared2FCBBoxHead,
    bbox_head_loss,
    bbox_head_predict_single,
)
from rsprompter_tpu.models.roi_heads.mask_head import (
    FCNMaskHead,
    fcn_mask_loss,
    mask_targets_from_rois,
)
from rsprompter_tpu.models.roi_heads.roi_extractor import extract_roi_feats
from rsprompter_tpu.models.task_modules.assigners import max_iou_assign
from rsprompter_tpu.models.task_modules.samplers import random_sample_padded


def sample_proposals_batch(
    rng: jax.Array,
    proposals: jax.Array,  # (B, N, 4)
    proposal_valid: jax.Array,  # (B, N)
    gt_bboxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
    num: int = 512,
    pos_fraction: float = 0.25,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.5,
    min_pos_iou: float = 0.5,
    add_gt_as_proposals: bool = True,
):
    """Returns per-image sampled RoIs and targets, all (B, num, ...)."""
    b = proposals.shape[0]
    if add_gt_as_proposals:
        proposals = jnp.concatenate([gt_bboxes, proposals], axis=1)
        proposal_valid = jnp.concatenate([gt_valid, proposal_valid], axis=1)

    def per_image(key, boxes, bvalid, gtb, gtl, gtv):
        # degenerate (padded) proposals get zero overlap automatically
        boxes = jnp.where(bvalid[:, None], boxes, 0.0)
        assign = max_iou_assign(
            boxes, gtb, gtl, gtv,
            pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
            min_pos_iou=min_pos_iou,
        )
        gt_inds = jnp.where(bvalid, assign.gt_inds, -1)
        sample = random_sample_padded(key, gt_inds, num=num, pos_fraction=pos_fraction)
        sboxes = boxes[sample.inds]
        g = gtb.shape[0]
        safe_gt = jnp.clip(sample.gt_inds - 1, 0, g - 1)
        labels = jnp.where(sample.is_pos, gtl[safe_gt], -1)
        matched_gt = gtb[safe_gt]
        return sboxes, labels, matched_gt, sample.valid, sample.is_pos, sample.gt_inds

    keys = jax.random.split(rng, b)
    return jax.vmap(per_image)(
        keys, proposals, proposal_valid, gt_bboxes, gt_labels, gt_valid
    )


def boxes_to_rois(boxes: jax.Array) -> jax.Array:
    """(B, N, 4) -> (B*N, 5) with batch indices prepended."""
    b, n, _ = boxes.shape
    batch_idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), n)[:, None]
    return jnp.concatenate([batch_idx, boxes.reshape(b * n, 4)], axis=1)


class StandardRoIHead(nn.Module):
    num_classes: int = 1
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    bbox_roi_size: int = 7
    mask_roi_size: int = 14
    # 0 = mmcv-exact adaptive ceil(bin) sampling (parity default); >0 = fixed
    roi_sampling_ratio: int = 0
    mask_size: int = 28
    num_samples: int = 512
    pos_fraction: float = 0.25
    with_mask: bool = True
    class_agnostic_mask: bool = False
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    test_cfg: Any = None
    dtype: Any = None

    def setup(self):
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype
        )
        if self.with_mask:
            self.mask_head = FCNMaskHead(
                num_classes=self.num_classes,
                class_agnostic=self.class_agnostic_mask,
                dtype=self.dtype,
            )

    @property
    def num_mask_slots(self) -> int:
        return max(int(self.num_samples * self.pos_fraction), 1)

    def loss(
        self,
        feats: Sequence[jax.Array],
        proposals: jax.Array,
        proposal_valid: jax.Array,
        gt_bboxes: jax.Array,
        gt_labels: jax.Array,
        gt_valid: jax.Array,
        gt_masks: jax.Array,
        rng: jax.Array,
    ) -> Dict[str, jax.Array]:
        b = proposals.shape[0]
        sboxes, labels, matched_gt, valid, is_pos, gt_inds = sample_proposals_batch(
            rng, proposals, proposal_valid, gt_bboxes, gt_labels, gt_valid,
            num=self.num_samples, pos_fraction=self.pos_fraction,
        )
        rois = boxes_to_rois(sboxes)
        bbox_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], rois,
            (self.bbox_roi_size, self.bbox_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        cls_logits, bbox_deltas = self.bbox_head(bbox_feats)
        flat_labels = jnp.where(
            labels.reshape(-1) >= 0, labels.reshape(-1), self.num_classes
        )
        losses = bbox_head_loss(
            cls_logits, bbox_deltas, sboxes.reshape(-1, 4), flat_labels,
            matched_gt.reshape(-1, 4), valid.reshape(-1), is_pos.reshape(-1),
            self.num_classes, self.target_stds,
        )

        if not self.with_mask:
            return losses
        # mask branch on the first num_mask_slots (positives are packed first)
        m = self.num_mask_slots
        mask_rois = boxes_to_rois(sboxes[:, :m])
        mask_pos = (is_pos[:, :m] & valid[:, :m]).reshape(-1)
        mask_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], mask_rois,
            (self.mask_roi_size, self.mask_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        mask_logits = self.mask_head(mask_feats)
        targets = mask_targets_from_rois(
            gt_masks, mask_rois, gt_inds[:, :m].reshape(-1),
            (self.mask_size, self.mask_size),
        )
        losses["loss_mask"] = fcn_mask_loss(
            mask_logits, targets, jnp.clip(labels[:, :m].reshape(-1), 0, None),
            mask_pos, self.class_agnostic_mask,
        )
        return losses

    def tensor(
        self,
        feats: Sequence[jax.Array],
        proposals: jax.Array,  # (B, N, 4)
    ):
        """Raw head outputs on the proposals — no decode/NMS/paste.

        The ``mode='tensor'`` branch of the reference's 3-mode forward
        contract (``mmdet/models/detectors/base.py:59-99`` dispatching to
        ``StandardRoIHead.forward``, which runs the bbox head on all
        proposals and the mask head on the first 100 rois only).
        Returns (cls_logits (B, N, C+1), bbox_deltas (B, N, 4C),
        mask_logits (B, min(N,100), S, S, Cm)).
        """
        b, n, _ = proposals.shape
        rois = boxes_to_rois(proposals)
        bbox_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], rois,
            (self.bbox_roi_size, self.bbox_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        cls_logits, bbox_deltas = self.bbox_head(bbox_feats)
        out = (cls_logits.reshape(b, n, -1), bbox_deltas.reshape(b, n, -1))
        if not self.with_mask:
            return out
        m = min(n, 100)  # reference slice: standard_roi_head.forward rois[:100]
        mask_rois = boxes_to_rois(proposals[:, :m])
        mask_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], mask_rois,
            (self.mask_roi_size, self.mask_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        mask_logits = self.mask_head(mask_feats)
        s = mask_logits.shape[-2]
        return out + (mask_logits.reshape(b, m, s, s, -1),)

    def predict(
        self,
        feats: Sequence[jax.Array],
        proposals: jax.Array,  # (B, N, 4)
        proposal_valid: jax.Array,
        img_shapes: jax.Array,  # (B, 2)
    ) -> Tuple[DetResult, jax.Array]:
        """Returns (batched DetResult (B, max_dets, ...), mask probs
        (B, max_dets, 2*roi, 2*roi))."""
        b, n, _ = proposals.shape
        rois = boxes_to_rois(proposals)
        bbox_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], rois,
            (self.bbox_roi_size, self.bbox_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        cls_logits, bbox_deltas = self.bbox_head(bbox_feats)
        cfg = dict(self.test_cfg or {})

        def per_image(cl, bd, props, pv, shape):
            return bbox_head_predict_single(
                cl, bd, props, pv, shape, self.num_classes, cfg, self.target_stds
            )
        dets = jax.vmap(per_image)(
            cls_logits.reshape(b, n, -1),
            bbox_deltas.reshape(b, n, -1),
            proposals, proposal_valid, img_shapes,
        )

        if not self.with_mask:
            return dets, None
        mask_rois = boxes_to_rois(dets.boxes)
        mask_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], mask_rois,
            (self.mask_roi_size, self.mask_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        mask_logits = self.mask_head(mask_feats)  # (B*D, S, S, C)
        if self.class_agnostic_mask:
            sel = mask_logits[..., 0]
        else:
            lab = jnp.clip(dets.labels.reshape(-1), 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                mask_logits, lab[:, None, None, None], axis=-1
            )[..., 0]
        s = sel.shape[-1]
        mask_probs = jax.nn.sigmoid(sel.astype(jnp.float32)).reshape(b, -1, s, s)
        return dets, mask_probs
