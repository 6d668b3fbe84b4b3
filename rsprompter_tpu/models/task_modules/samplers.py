"""Static-shape random pos/neg sampling.

Behavior parity: reference
``mmdet/models/task_modules/samplers/random_sampler.py:14`` — sample up to
``num * pos_fraction`` positives and fill the rest with negatives, uniformly
at random. Re-designed for TPU: instead of dynamic index lists, produce a
fixed-length index vector (positives first) plus validity/positivity masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    inds: jax.Array  # (num,) int32 indices into priors; padded entries repeat
    valid: jax.Array  # (num,) bool
    is_pos: jax.Array  # (num,) bool
    gt_inds: jax.Array  # (num,) int32 (1-based gt index for pos, 0 otherwise)


def _group_rank(member: jax.Array, rand: jax.Array) -> jax.Array:
    """rank of each element within its group (members get 0..k-1, others big)."""
    n = member.shape[0]
    key = jnp.where(member, rand, jnp.inf)
    order = jnp.argsort(key)
    rank = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(member, rank, n)


def random_sample_padded(
    key: jax.Array,
    assigned_gt_inds: jax.Array,  # (P,) from max_iou_assign
    num: int = 256,
    pos_fraction: float = 0.5,
) -> SampleResult:
    p = assigned_gt_inds.shape[0]
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    kp, kn, kt = jax.random.split(key, 3)
    num_expected_pos = int(num * pos_fraction)

    pos_rank = _group_rank(is_pos, jax.random.uniform(kp, (p,)))
    sel_pos = is_pos & (pos_rank < num_expected_pos)
    num_pos = sel_pos.sum()

    neg_rank = _group_rank(is_neg, jax.random.uniform(kn, (p,)))
    sel_neg = is_neg & (neg_rank < (num - num_pos))

    # order: positives first (stable slot for mask heads), then negatives
    priority = (
        sel_pos.astype(jnp.float32) * 2.0
        + sel_neg.astype(jnp.float32)
        + jax.random.uniform(kt, (p,)) * 1e-3
    )
    inds = jnp.argsort(-priority)[:num].astype(jnp.int32)
    valid = (sel_pos | sel_neg)[inds]
    pos = sel_pos[inds]
    gt_inds = jnp.where(pos, assigned_gt_inds[inds], 0)
    return SampleResult(inds, valid, pos, gt_inds)
