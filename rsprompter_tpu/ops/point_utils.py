"""Uncertainty-based point sampling for mask losses.

Behavior parity: reference ``mmdet/models/utils/point_sample.py:7,33``
(``get_uncertain_point_coords_with_randomness``): oversample random points,
keep the top ``importance_ratio`` fraction by uncertainty (-|logit|), fill the
rest with fresh uniform points. All shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rsprompter_tpu.ops.sampling import point_sample


def sample_mask_points(masks: jax.Array, points: jax.Array) -> jax.Array:
    """masks (N, H, W), points (N, P, 2) in [0,1] (x,y) -> (N, P)."""
    return point_sample(masks[..., None], points)[..., 0]


def uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jax.Array,  # (N, H, W)
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jax.Array:
    """Returns (N, num_points, 2) coords in [0,1]."""
    n = mask_logits.shape[0]
    k_over = int(num_points * oversample_ratio)
    k_imp = int(num_points * importance_sample_ratio)
    k_rand = num_points - k_imp
    r1, r2 = jax.random.split(rng)
    cand = jax.random.uniform(r1, (n, k_over, 2))
    logits = sample_mask_points(jax.lax.stop_gradient(mask_logits), cand)
    uncertainty = -jnp.abs(logits)
    _, idx = jax.lax.top_k(uncertainty, k_imp)
    imp = jnp.take_along_axis(cand, idx[..., None], axis=1)
    rand = jax.random.uniform(r2, (n, k_rand, 2))
    return jnp.concatenate([imp, rand], axis=1)
