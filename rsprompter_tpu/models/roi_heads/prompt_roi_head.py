"""RoI head for RSPrompter-anchor: bbox head + SAM-prompting mask head.

Behavior parity: reference ``RSPrompterAnchorRoIPromptHead``
(``mmdet/rsprompter/models.py:1367-1593``):
  * optional ``extra_pe`` — sine PE computed at level-0 size, bilinear-resized
    onto every FPN level (:1466-1474, :1566-1574);
  * mask branch feeds RoI feats + SAM image embeddings into the prompter mask
    head; targets are **full-image-size** GT masks (``mask_size=crop_size``,
    parity-critical SURVEY A.4) with CE on bilinear-upsampled 256^2 preds
    (:1700-1744);
  * predict: full-frame SAM masks (no RoI paste), sigmoid -> resize chain
    handled by ``ops.masks`` / host postprocess (:1746-1784).

The ``mask_loss_resolution`` knob allows computing the CE at the SAM 256^2
output instead (targets downsampled) — numerically different from the
reference but ~16x lighter on HBM; default keeps reference parity.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.layers import sine_positional_encoding
from rsprompter_tpu.models.losses import mask_cross_entropy
from rsprompter_tpu.models.roi_heads.bbox_head import (
    Shared2FCBBoxHead,
    bbox_head_loss,
    bbox_head_predict_single,
)
from rsprompter_tpu.models.roi_heads.prompt_mask_head import RSPrompterAnchorMaskHead
from rsprompter_tpu.models.roi_heads.roi_extractor import extract_roi_feats
from rsprompter_tpu.models.roi_heads.standard_roi_head import (
    boxes_to_rois,
    sample_proposals_batch,
)
from rsprompter_tpu.models.sam.configs import SamMaskDecoderConfig


def add_extra_pe(feats: Sequence[jax.Array], num_feats: int) -> Tuple[jax.Array, ...]:
    """Add sine PE (computed at level-0 size, resized per level) to each map."""
    h0, w0 = feats[0].shape[1:3]
    pe = sine_positional_encoding(h0, w0, num_feats=num_feats)[None]
    out = []
    for f in feats:
        pe_l = jax.image.resize(
            pe, (1, f.shape[1], f.shape[2], pe.shape[-1]), method="bilinear"
        )
        out.append(f + pe_l.astype(f.dtype))
    return tuple(out)


class RSPrompterAnchorRoIPromptHead(nn.Module):
    decoder_config: SamMaskDecoderConfig
    num_classes: int = 1
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    bbox_roi_size: int = 7
    mask_roi_size: int = 14
    # 0 = mmcv-exact adaptive ceil(bin) sampling (parity default); >0 = fixed
    roi_sampling_ratio: int = 0
    num_samples: int = 256
    pos_fraction: float = 0.25
    with_extra_pe: bool = True
    per_pointset_point: int = 5
    with_sincos: bool = True
    multimask_output: bool = False
    class_agnostic: bool = True
    mask_loss_resolution: str = "full"  # 'full' (reference parity) | 'low'
    decoder_freeze: bool = True
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    test_cfg: Any = None
    dtype: Any = None

    def setup(self):
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype
        )
        self.mask_head = RSPrompterAnchorMaskHead(
            decoder_config=self.decoder_config,
            roi_feat_size=self.mask_roi_size,
            per_pointset_point=self.per_pointset_point,
            with_sincos=self.with_sincos,
            multimask_output=self.multimask_output,
            class_agnostic=self.class_agnostic,
            dtype=self.dtype,
        )

    @property
    def num_mask_slots(self) -> int:
        return max(int(self.num_samples * self.pos_fraction), 1)

    def _maybe_add_pe(self, feats):
        if self.with_extra_pe:
            c = feats[0].shape[-1]
            return add_extra_pe(feats, num_feats=c // 2)
        return tuple(feats)

    def _mask_forward(self, feats, boxes_grouped, image_embeddings, image_pe, train):
        """boxes_grouped: (B, R, 4) -> masks (B, R, S, S), iou (B, R)."""
        b, r = boxes_grouped.shape[:2]
        rois = boxes_to_rois(boxes_grouped)
        mask_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], rois,
            (self.mask_roi_size, self.mask_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        mask_feats = mask_feats.reshape((b, r) + mask_feats.shape[1:])
        masks, iou = self.mask_head(
            mask_feats, image_embeddings, image_pe, train=train
        )
        # decoder_freeze is enforced by the optimizer's param mask; gradients
        # still flow *through* the frozen decoder into point_emb, as in the
        # reference (models.py:66-75 freezes params, not the graph)
        s = masks.shape[-1]
        return masks.reshape(b, r, s, s), iou.reshape(b, r)

    def loss(
        self,
        feats: Sequence[jax.Array],
        proposals: jax.Array,
        proposal_valid: jax.Array,
        gt_bboxes: jax.Array,
        gt_labels: jax.Array,
        gt_valid: jax.Array,
        gt_masks: jax.Array,  # (B, G, H, W) full-image-size
        image_embeddings: jax.Array,
        image_pe: jax.Array,
        rng: jax.Array,
    ) -> Dict[str, jax.Array]:
        feats = self._maybe_add_pe(feats)
        b = proposals.shape[0]
        sboxes, labels, matched_gt, valid, is_pos, gt_inds = sample_proposals_batch(
            rng, proposals, proposal_valid, gt_bboxes, gt_labels, gt_valid,
            num=self.num_samples, pos_fraction=self.pos_fraction,
            pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
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

        # prompter mask branch on the packed positive slots
        m = self.num_mask_slots
        pos_boxes = sboxes[:, :m]  # (B, M, 4)
        pos_mask = is_pos[:, :m] & valid[:, :m]
        mask_preds, _ = self._mask_forward(
            feats, pos_boxes, image_embeddings, image_pe, train=True
        )  # (B, M, S, S)

        g = gt_masks.shape[1]
        safe_gt = jnp.clip(gt_inds[:, :m] - 1, 0, g - 1)
        targets = jnp.take_along_axis(
            gt_masks, safe_gt[:, :, None, None], axis=1
        )  # (B, M, H, W)

        s = mask_preds.shape[-1]
        if self.mask_loss_resolution == "full":
            th, tw = targets.shape[-2:]
            preds = jax.image.resize(
                mask_preds, (b, m, th, tw), method="bilinear"
            )
            tgt = targets
        else:
            preds = mask_preds
            tgt = jax.image.resize(
                targets.astype(jnp.float32), (b, m, s, s), method="bilinear"
            )
            tgt = (tgt >= 0.5).astype(jnp.float32)
        losses["loss_mask"] = mask_cross_entropy(
            preds.reshape((b * m,) + preds.shape[2:]),
            tgt.reshape((b * m,) + tgt.shape[2:]),
            valid=pos_mask.reshape(-1),
        )
        return losses

    def tensor(
        self,
        feats: Sequence[jax.Array],
        proposals: jax.Array,
        image_embeddings: jax.Array,
        image_pe: jax.Array,
    ):
        """Raw head outputs, no decode/NMS — the ``mode='tensor'`` branch of
        the reference's 3-mode forward contract (``base.py:59-99``): bbox
        head on all proposals, the SAM-prompter mask branch on the first
        ``num_mask_slots`` proposals. Returns (cls_logits (B, N, C+1),
        bbox_deltas (B, N, 4C), mask_logits (B, M, S, S), iou (B, M))."""
        feats = self._maybe_add_pe(feats)
        b, n, _ = proposals.shape
        rois = boxes_to_rois(proposals)
        bbox_feats = extract_roi_feats(
            feats[: len(self.featmap_strides)], rois,
            (self.bbox_roi_size, self.bbox_roi_size), self.featmap_strides,
            sampling_ratio=self.roi_sampling_ratio,
        )
        cls_logits, bbox_deltas = self.bbox_head(bbox_feats)
        m = min(n, self.num_mask_slots)
        mask_logits, iou = self._mask_forward(
            feats, proposals[:, :m], image_embeddings, image_pe, train=False
        )
        return (cls_logits.reshape(b, n, -1), bbox_deltas.reshape(b, n, -1),
                mask_logits, iou)

    def predict(
        self,
        feats: Sequence[jax.Array],
        proposals: jax.Array,
        proposal_valid: jax.Array,
        img_shapes: jax.Array,
        image_embeddings: jax.Array,
        image_pe: jax.Array,
    ):
        feats = self._maybe_add_pe(feats)
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
        mask_preds, iou = self._mask_forward(
            feats, dets.boxes, image_embeddings, image_pe, train=False
        )
        mask_probs = jax.nn.sigmoid(mask_preds.astype(jnp.float32))
        return dets, mask_probs
