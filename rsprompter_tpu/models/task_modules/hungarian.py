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
    """Batched matching: scipy host round-trip on single-device CPU,
    ON-DEVICE auction everywhere else.

    cost (..., Q, G), gt_valid (..., G) -> (..., G). The query head stacks
    every decoder layer's cost matrix and calls this once per forward.

    Dispatch (trace-time, on device topology):

    * **single-device CPU** — ONE ``pure_callback`` into scipy: exact
      Hungarian, bit-for-bit comparable against the reference's per-image
      scipy (mmdet/rsprompter/models.py:555) in parity tests.
    * **TPU** — the axon backend does not implement host callbacks at all
      (``UNIMPLEMENTED: axon_pjrt does not support host send/recv
      callbacks``); the assignment runs as an epsilon-scaled auction
      entirely on device (:func:`auction_match`), optimal to within
      G*eps of the Hungarian optimum.
    * **any multi-device mesh (CPU included)** — also the auction: a
      ``pure_callback`` output is placed ``{maximal device=0}``, which
      forces XLA SPMD into an "involuntary full rematerialization"
      (replicate-then-repartition) of everything downstream in
      ``RSPrompterQuery.loss`` — a real-mesh perf hazard on the hot loss
      path AND a slow-compile contributor. The auction is pure JAX
      (vmapped ``while_loop``), so the batch axis stays sharded on 'data'
      and the sharded loss exercises the SAME code path as real TPU
      meshes. scipy-vs-auction agreement is pinned by
      ``tests/test_task_modules.py::test_auction_match_reaches_hungarian_optimum``.
    """
    *lead, q, g = cost.shape
    devs = jax.devices()
    if devs[0].platform == "cpu" and len(devs) == 1:
        n = int(np.prod(lead)) if lead else 1
        out = jax.pure_callback(
            _lsa_host_batched,
            jax.ShapeDtypeStruct((n, g), jnp.int32),
            cost.astype(jnp.float32).reshape(n, q, g),
            gt_valid.reshape(n, g),
            vmap_method="sequential",
        )
        return out.reshape(*lead, g)
    # nested vmap over the leading axes (no reshape: a (L, B, Q, G) stack
    # with B sharded on 'data' keeps its sharding through vmap, while a
    # merge-reshape of (L, B) would drop it)
    fn = auction_match
    for _ in lead:
        fn = jax.vmap(fn)
    return fn(cost.astype(jnp.float32), gt_valid)


def auction_match(
    cost: jax.Array,
    gt_valid: jax.Array,
    eps: float = 1e-3,
    max_rounds: int = 4096,
) -> jax.Array:
    """Assignment by Jacobi auction, fully on device (no host callback).

    cost (Q, G) float32, gt_valid (G,) bool -> matched query per gt (G,),
    -1 for invalid gts. Bidders are the (few) valid gts, objects the Q
    queries; parallel bidding rounds run in a ``lax.while_loop`` until every
    valid bidder holds an object. On termination the assignment is within
    ``G * eps`` of the Hungarian optimum (epsilon-complementary slackness,
    Bertsekas 1988). Single phase — epsilon-scaling with carried prices was
    measured to truncate mid-auction on the later phases and return
    garbage; with objects outnumbering bidders ~5:1 here, one phase
    converges in a handful of rounds. If ``max_rounds`` is ever hit
    (adversarial near-tie costs), remaining bidders are completed greedily
    so the result is always a valid one-to-one assignment.
    """
    qn, gn = cost.shape
    # Non-finite costs (NaN included) map to BIG_COST = repulsive, matching
    # _lsa_host's np.where(isfinite, ., BIG_COST) so the two platforms agree.
    benefit = jnp.where(
        gt_valid[None, :],
        -jnp.nan_to_num(cost, nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST),
        0.0,
    ).T  # (G, Q)

    def cond(st):
        prices, owner, assigned, it = st
        return jnp.any(gt_valid & (assigned < 0)) & (it < max_rounds)

    def body(st):
        prices, owner, assigned, it = st
        unassigned = gt_valid & (assigned < 0)
        vals = benefit - prices[None, :]  # (G, Q)
        j_star = jnp.argmax(vals, axis=1)
        w1 = jnp.max(vals, axis=1)
        vals2 = vals.at[jnp.arange(gn), j_star].set(-jnp.inf)
        w2 = jnp.max(vals2, axis=1)
        w2 = jnp.where(jnp.isfinite(w2), w2, w1 - 1.0)
        bid = prices[j_star] + (w1 - w2) + eps  # (G,)
        bid_mat = jnp.full((gn, qn), -jnp.inf)
        bid_mat = bid_mat.at[jnp.arange(gn), j_star].set(
            jnp.where(unassigned, bid, -jnp.inf)
        )
        best_bid = jnp.max(bid_mat, axis=0)  # (Q,)
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        has_bid = best_bid > -jnp.inf
        new_prices = jnp.where(has_bid, best_bid, prices)
        kicked = has_bid & (owner >= 0) & (owner != winner)
        assigned = assigned.at[jnp.where(kicked, owner, gn)].set(-1, mode="drop")
        assigned = assigned.at[jnp.where(has_bid, winner, gn)].set(
            jnp.where(has_bid, jnp.arange(qn, dtype=jnp.int32), -1),
            mode="drop",
        )
        new_owner = jnp.where(has_bid, winner, owner)
        return new_prices, new_owner, assigned, it + 1

    prices, owner, assigned, _ = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.zeros((qn,), jnp.float32),
            jnp.full((qn,), -1, jnp.int32),
            jnp.where(gt_valid, -1, 0).astype(jnp.int32),
            0,
        ),
    )

    # greedy completion (no-op unless max_rounds truncated the auction)
    def fill(g, carry):
        assigned, taken = carry
        # If every query is already taken (more valid gts than queries) there
        # is no one-to-one completion: leave the gt at -1 rather than letting
        # argmax-over-all(-inf) alias multiple gts onto query 0.
        need = gt_valid[g] & (assigned[g] < 0) & ~jnp.all(taken)
        avail = jnp.where(taken, -jnp.inf, benefit[g])
        pick = jnp.argmax(avail).astype(jnp.int32)
        assigned = assigned.at[g].set(jnp.where(need, pick, assigned[g]))
        taken = taken.at[pick].set(jnp.where(need, True, taken[pick]))
        return assigned, taken

    taken = jnp.zeros((qn,), bool).at[
        jnp.where(gt_valid & (assigned >= 0), assigned, qn)
    ].set(True, mode="drop")
    assigned, _ = jax.lax.fori_loop(0, gn, fill, (assigned, taken))
    return jnp.where(gt_valid, assigned, -1)


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
