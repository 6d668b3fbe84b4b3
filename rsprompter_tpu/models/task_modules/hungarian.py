"""Hungarian assignment for query-based heads (host callback, static shapes).

Behavior parity: reference
``mmdet/models/task_modules/assigners/hungarian_assigner.py:16`` with the
RSPrompter-query costs (``_base_/rsprompter_query.py`` train_cfg):
ClassificationCost(2.0) + CrossEntropyLossCost(5.0, sigmoid) +
DiceCost(5.0, pred_act, eps=1.0), computed on a shared set of randomly
sampled mask points (mmdet ``Mask2FormerHead.get_targets``).

scipy's ``linear_sum_assignment`` runs host-side via ``jax.pure_callback``
(SURVEY §7 hard-part #3: Hungarian stays a host callback — the matrices are
tiny (Q x G), the round-trip is negligible next to the SAM decode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BIG_COST = 1e8


def _lsa_host(cost: np.ndarray, gt_valid: np.ndarray) -> np.ndarray:
    """cost (Q, G); returns per-gt matched query index (G,), -1 for invalid."""
    from scipy.optimize import linear_sum_assignment

    q, g = cost.shape
    out = -np.ones(g, np.int32)
    valid_idx = np.flatnonzero(gt_valid)
    if len(valid_idx) == 0:
        return out
    sub = cost[:, valid_idx]
    sub = np.where(np.isfinite(sub), sub, BIG_COST)
    rows, cols = linear_sum_assignment(sub)
    out[valid_idx[cols]] = rows.astype(np.int32)
    return out


def hungarian_match(cost: jax.Array, gt_valid: jax.Array) -> jax.Array:
    """cost (Q, G) float32, gt_valid (G,) bool -> matched query per gt (G,)."""
    g = cost.shape[1]
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((g,), jnp.int32),
        cost.astype(jnp.float32),
        gt_valid,
        vmap_method="sequential",
    )


def _lsa_host_batched(cost: np.ndarray, gt_valid: np.ndarray) -> np.ndarray:
    """cost (N, Q, G), gt_valid (N, G) -> (N, G) matched query per gt."""
    return np.stack([
        _lsa_host(cost[i], gt_valid[i]) for i in range(cost.shape[0])
    ])


def hungarian_match_batched(cost: jax.Array, gt_valid: jax.Array) -> jax.Array:
    """Batched matching in ONE host round-trip.

    cost (..., Q, G), gt_valid (..., G) -> (..., G). The query head stacks
    every decoder layer's cost matrix and calls this once per forward —
    on a remote TPU a host callback costs far more in transport latency
    than the scipy solve, so layers x batch round-trips collapse to one
    (reference cost anchor: per-image scipy at
    mmdet/rsprompter/models.py:555).
    """
    *lead, q, g = cost.shape
    n = int(np.prod(lead)) if lead else 1
    out = jax.pure_callback(
        _lsa_host_batched,
        jax.ShapeDtypeStruct((n, g), jnp.int32),
        cost.astype(jnp.float32).reshape(n, q, g),
        gt_valid.reshape(n, g),
        vmap_method="sequential",
    )
    return out.reshape(*lead, g)


def classification_cost(cls_logits: jax.Array, gt_labels: jax.Array) -> jax.Array:
    """-softmax prob of the gt class: (Q, C+1), (G,) -> (Q, G)."""
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    return -probs[:, gt_labels]


def bce_cost(pred_pts: jax.Array, gt_pts: jax.Array) -> jax.Array:
    """Point-sampled sigmoid CE cost: (Q, P) logits, (G, P) {0,1} -> (Q, G).

    Matches mmdet CrossEntropyLossCost(use_sigmoid): mean over points of the
    pairwise BCE, computed via the pos/neg decomposition.
    """
    p = pred_pts.shape[1]
    pos = jax.nn.softplus(-pred_pts)  # -log sigmoid
    neg = jax.nn.softplus(pred_pts)  # -log(1 - sigmoid)
    cost = pos @ gt_pts.T.astype(pos.dtype) + neg @ (1.0 - gt_pts.T.astype(neg.dtype))
    return cost / p


def dice_cost(pred_pts: jax.Array, gt_pts: jax.Array, eps: float = 1.0) -> jax.Array:
    """Pairwise dice cost on sampled points (pred activated by sigmoid)."""
    pred = jax.nn.sigmoid(pred_pts.astype(jnp.float32))
    gt = gt_pts.astype(jnp.float32)
    num = 2 * (pred @ gt.T)
    den = pred.sum(-1)[:, None] + gt.sum(-1)[None, :]
    return -(num + eps) / (den + eps) + 1.0
