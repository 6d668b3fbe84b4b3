"""Vectorized MaxIoU assignment with static shapes.

Behavior parity: reference
``mmdet/models/task_modules/assigners/max_iou_assigner.py:85`` — including the
``match_low_quality`` pass where each GT claims its best-overlap prior(s)
(``gt_max_assign_all``), with later GTs overriding earlier ones. The
sequential GT loop becomes a masked max over the GT axis.

Padded-GT convention: invalid GT rows are masked out of the overlap matrix so
they can never assign (SURVEY §7 hard-part #2: dynamic counts -> masks).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rsprompter_tpu.ops.boxes import bbox_overlaps


class AssignResult(NamedTuple):
    gt_inds: jax.Array  # (P,) int32: -1 ignore, 0 negative, i+1 -> gt i
    max_overlaps: jax.Array  # (P,)
    labels: jax.Array  # (P,) int32 assigned class label, -1 if not positive


def max_iou_assign(
    priors: jax.Array,  # (P, 4)
    gt_bboxes: jax.Array,  # (G, 4) padded
    gt_labels: jax.Array,  # (G,)
    gt_valid: jax.Array,  # (G,) bool
    pos_iou_thr: float = 0.7,
    neg_iou_thr: float = 0.3,
    min_pos_iou: float = 0.3,
    match_low_quality: bool = True,
    prior_valid: Optional[jax.Array] = None,
) -> AssignResult:
    g = gt_bboxes.shape[0]
    overlaps = bbox_overlaps(gt_bboxes, priors)  # (G, P)
    overlaps = jnp.where(gt_valid[:, None], overlaps, 0.0)

    max_overlaps = overlaps.max(axis=0)
    argmax_gt = overlaps.argmax(axis=0)

    assigned = -jnp.ones(priors.shape[0], jnp.int32)
    # mmdet semantics: negatives are max_overlaps in [0, neg_thr)
    assigned = jnp.where(max_overlaps < neg_iou_thr, 0, assigned)
    assigned = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_gt.astype(jnp.int32) + 1, assigned
    )

    if match_low_quality:
        gt_max = overlaps.max(axis=1, keepdims=True)  # (G, 1)
        claim = (
            (overlaps == gt_max)
            & (gt_max >= min_pos_iou)
            & gt_valid[:, None]
        )  # (G, P)
        # later GT overrides earlier: take the largest claiming gt index
        gt_ids = jnp.arange(1, g + 1, dtype=jnp.int32)[:, None]
        lowq = jnp.max(jnp.where(claim, gt_ids, 0), axis=0)  # (P,)
        assigned = jnp.where(lowq > 0, lowq, assigned)

    if prior_valid is not None:
        assigned = jnp.where(prior_valid, assigned, -1)

    labels = jnp.where(
        assigned > 0,
        gt_labels[jnp.clip(assigned - 1, 0, g - 1)].astype(jnp.int32),
        -1,
    )
    return AssignResult(assigned, max_overlaps, labels)
