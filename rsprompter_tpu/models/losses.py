"""Weighted detection losses (pure JAX).

Behavior parity: reference ``mmdet/models/losses/`` — ``CrossEntropyLoss``
(``cross_entropy_loss.py:202``, incl. the ``use_mask=True`` per-instance mask
CE), ``DiceLoss`` (``dice_loss.py:66``), ``SmoothL1Loss``
(``smooth_l1_loss.py:56``), ``FocalLoss``. All take elementwise ``weight`` and
an ``avg_factor`` normalizer — the masked-static-shape idiom this framework
uses instead of dynamic gather/boolean indexing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jax.Array, weight, avg_factor, reduction: str = "mean"):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if avg_factor is None:
        if weight is None:
            return loss.mean()
        denom = jnp.maximum(weight.sum(), 1e-12)
        return loss.sum() / denom
    return loss.sum() / jnp.maximum(avg_factor, 1e-12)


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    weight: Optional[jax.Array] = None,
    avg_factor=None,
    reduction: str = "mean",
) -> jax.Array:
    """Softmax CE with integer labels (..., C) vs (...,)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _reduce(nll, weight, avg_factor, reduction)


def binary_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    weight: Optional[jax.Array] = None,
    avg_factor=None,
    reduction: str = "mean",
) -> jax.Array:
    """Sigmoid BCE with logits; targets same shape (float 0/1)."""
    t = targets.astype(logits.dtype)
    loss = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _reduce(loss, weight, avg_factor, reduction)


def smooth_l1(
    pred: jax.Array,
    target: jax.Array,
    beta: float = 1.0,
    weight: Optional[jax.Array] = None,
    avg_factor=None,
    reduction: str = "mean",
) -> jax.Array:
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, weight, avg_factor, reduction)


def l1_loss(
    pred: jax.Array,
    target: jax.Array,
    weight: Optional[jax.Array] = None,
    avg_factor=None,
    reduction: str = "mean",
) -> jax.Array:
    return _reduce(jnp.abs(pred - target), weight, avg_factor, reduction)


def sigmoid_focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    gamma: float = 2.0,
    alpha: float = 0.25,
    weight: Optional[jax.Array] = None,
    avg_factor=None,
    reduction: str = "mean",
) -> jax.Array:
    """Binary focal loss with logits (targets float 0/1, same shape)."""
    p = jax.nn.sigmoid(logits)
    t = targets.astype(logits.dtype)
    ce = jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    return _reduce(loss, weight, avg_factor, reduction)


def dice_loss(
    pred: jax.Array,
    target: jax.Array,
    weight: Optional[jax.Array] = None,
    eps: float = 1e-3,
    avg_factor=None,
    reduction: str = "mean",
    activate: bool = True,
) -> jax.Array:
    """Dice loss over the last axis-flattened masks: pred/target (N, ...)."""
    if activate:
        pred = jax.nn.sigmoid(pred)
    n = pred.shape[0]
    p = pred.reshape(n, -1)
    t = target.reshape(n, -1).astype(pred.dtype)
    num = 2 * (p * t).sum(-1)
    den = (p * p).sum(-1) + (t * t).sum(-1)
    loss = 1 - (num + eps) / (den + eps)
    return _reduce(loss, weight, avg_factor, reduction)


def mask_cross_entropy(
    mask_logits: jax.Array,
    mask_targets: jax.Array,
    valid: Optional[jax.Array] = None,
    avg_factor=None,
) -> jax.Array:
    """Per-instance binary mask CE (the ``use_mask=True`` CE of the reference).

    mask_logits/(targets): (N, H, W); valid: (N,) instance mask. Average over
    pixels per instance, then over valid instances.
    """
    t = mask_targets.astype(mask_logits.dtype)
    loss = (
        jnp.maximum(mask_logits, 0)
        - mask_logits * t
        + jnp.log1p(jnp.exp(-jnp.abs(mask_logits)))
    )
    per_inst = loss.mean(axis=(-2, -1))
    if valid is not None:
        per_inst = per_inst * valid.astype(per_inst.dtype)
        denom = jnp.maximum(valid.sum(), 1.0) if avg_factor is None else avg_factor
        return per_inst.sum() / denom
    return per_inst.mean() if avg_factor is None else per_inst.sum() / avg_factor


def accuracy(logits: jax.Array, labels: jax.Array, valid=None) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        return (correct * v).sum() / jnp.maximum(v.sum(), 1.0)
    return correct.mean()
