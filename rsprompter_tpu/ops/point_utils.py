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


def sample_mask_points_shared(masks: jax.Array, points: jax.Array) -> jax.Array:
    """masks (N, H, W), ONE shared point set (P, 2) in [0,1] -> (N, P).

    Numerically identical to ``sample_mask_points`` with the points broadcast
    per mask, but exploits the shared indices: the 4 bilinear corners become
    plain ``take``s of shared columns from the flattened (N, H*W) masks, which
    XLA vectorizes across the N rows — versus a generic per-(mask, point) 2-D
    gather. This is the hot sampler of the Hungarian match cost, where all Q
    predictions and G targets are sampled at the same random points
    (reference ``mmdet/.../maskformer_head.py`` point-sampled match cost)."""
    h, w = masks.shape[-2:]
    # grid_sample align_corners=False pixel-center mapping (ops/sampling.py)
    x = points[:, 0] * w - 0.5
    y = points[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    # (H*W, N): shared pixel index on the LEADING axis -> each take is an
    # embedding-style lookup of a contiguous N-vector (the fast TPU gather)
    flat_t = masks.reshape(masks.shape[0], h * w).T

    def take(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = (
            jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        )
        return jnp.where(inside[:, None], jnp.take(flat_t, idx, axis=0), 0.0)

    out_t = (
        take(y0, x0) * ((1 - wy1) * (1 - wx1))[:, None]
        + take(y0, x0 + 1) * ((1 - wy1) * wx1)[:, None]
        + take(y0 + 1, x0) * (wy1 * (1 - wx1))[:, None]
        + take(y0 + 1, x0 + 1) * (wy1 * wx1)[:, None]
    )
    return out_t.T


def sample_mask_points_matmul(masks: jax.Array, points: jax.Array) -> jax.Array:
    """Per-mask bilinear point sampling as MXU matmuls: (N, H, W) masks,
    (N, P, 2) per-mask points in [0,1] -> (N, P).

    The bilinear sample at (y, x) is separable over the four corners:
    ``out = (Σ_a wy_a·iy_a·e_{y_a})ᵀ M (Σ_b wx_b·ix_b·e_{x_b})`` where ``iy/ix``
    are the inside-of-border indicators (zero-padding becomes a product of
    per-axis indicators). Building the weighted one-hot row/column selectors
    turns the whole sampler into one (P, H) @ (H, W) matmul + a masked
    row-reduce — no gather at all. On TPU the generic per-(mask, point)
    gather runs ~50 ns/point on the scalar unit while this runs on the MXU;
    the backward also becomes matmuls instead of scatter-adds. Numerics:
    bf16 operands with fp32 accumulation (the model computes in bf16
    throughout; the reference trains AMP fp16)."""
    n, h, w = masks.shape
    x = points[..., 0] * w - 0.5
    y = points[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    def selectors(i0f, w1, size):
        """(N, P, size) weighted one-hot: corner i0 with weight 1-w1 plus
        corner i0+1 with weight w1, each zeroed when outside [0, size)."""
        ar = jnp.arange(size)
        out = 0.0
        for iof, wgt in ((i0f, 1.0 - w1), (i0f + 1.0, w1)):
            inside = (iof >= 0) & (iof < size)
            ic = jnp.clip(iof, 0, size - 1).astype(jnp.int32)
            out = out + (ar == ic[..., None]) * jnp.where(inside, wgt, 0.0)[..., None]
        return out.astype(jnp.bfloat16)

    yw = selectors(y0, wy1, h)  # (N, P, H)
    xw = selectors(x0, wx1, w)  # (N, P, W)
    rows = jnp.einsum(
        "nph,nhw->npw", yw, masks.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum(
        "npw,npw->np", rows, xw, preferred_element_type=jnp.float32
    )


def uncertain_point_coords(
    rng: jax.Array,
    mask_logits: jax.Array,  # (N, H, W)
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    sampler=sample_mask_points,
) -> jax.Array:
    """Returns (N, num_points, 2) coords in [0,1]."""
    n = mask_logits.shape[0]
    k_over = int(num_points * oversample_ratio)
    k_imp = int(num_points * importance_sample_ratio)
    k_rand = num_points - k_imp
    r1, r2 = jax.random.split(rng)
    cand = jax.random.uniform(r1, (n, k_over, 2))
    logits = sampler(jax.lax.stop_gradient(mask_logits), cand)
    uncertainty = -jnp.abs(logits)
    _, idx = jax.lax.top_k(uncertainty, k_imp)
    imp = jnp.take_along_axis(cand, idx[..., None], axis=1)
    rand = jax.random.uniform(r2, (n, k_rand, 2))
    return jnp.concatenate([imp, rand], axis=1)
