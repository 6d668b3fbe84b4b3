"""MaskFormer fusion head: query outputs -> padded instance detections.

Behavior parity: reference
``mmdet/models/seg_heads/panoptic_fusion_heads/maskformer_fusion_head.py:126``
(``instance_postprocess``) + the RS override
(``RSMaskFormerFusionHead``, ``mmdet/rsprompter/models.py:662-715``): top-k
over (query x class) softmax scores (bg dropped), mask-weighted rescoring,
``mask2bbox`` boxes; the crop/rescale-to-ori chain runs in the shared host
postprocess (``ops.masks.finalize_masks_np``). Test cfg parity (SURVEY A.9):
``max_per_image=100``, instance-only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rsprompter_tpu.models.roi_heads.bbox_head import DetResult


def mask2bbox(masks: jax.Array) -> jax.Array:
    """(N, H, W) binary -> (N, 4) xyxy tight boxes (zeros for empty)."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    any_row = masks.any(axis=2)
    any_col = masks.any(axis=1)
    big = jnp.asarray(1e9, jnp.float32)
    y1 = jnp.min(jnp.where(any_row, ys[None], big), axis=1)
    y2 = jnp.max(jnp.where(any_row, ys[None], -big), axis=1) + 1
    x1 = jnp.min(jnp.where(any_col, xs[None], big), axis=1)
    x2 = jnp.max(jnp.where(any_col, xs[None], -big), axis=1) + 1
    empty = ~any_row.any(axis=1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return jnp.where(empty[:, None], 0.0, boxes)


def instance_postprocess(
    cls_logits: jax.Array,  # (Q, C+1)
    mask_logits: jax.Array,  # (Q, h, w)
    num_classes: int,
    max_per_image: int = 100,
    scale_boxes: float = 1.0,
) -> Tuple[DetResult, jax.Array]:
    """Single image. Returns (DetResult at mask resolution * scale, mask probs
    (max_per_image, h, w))."""
    q = cls_logits.shape[0]
    scores_all = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[:, :num_classes]
    flat = scores_all.reshape(-1)
    k = min(max_per_image, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    q_idx = top_idx // num_classes
    labels = (top_idx % num_classes).astype(jnp.int32)
    masks = mask_logits[q_idx]  # (k, h, w)
    probs = jax.nn.sigmoid(masks.astype(jnp.float32))
    binary = probs > 0.5
    area = jnp.maximum(binary.sum(axis=(1, 2)).astype(jnp.float32), 1e-6)
    mask_scores = (probs * binary).sum(axis=(1, 2)) / area
    det_scores = top_scores * mask_scores
    boxes = mask2bbox(binary) * scale_boxes
    valid = binary.any(axis=(1, 2))
    return (
        DetResult(boxes=boxes, scores=det_scores, labels=labels, valid=valid),
        probs,
    )
