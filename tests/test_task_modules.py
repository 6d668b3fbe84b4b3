"""Tests: anchor generation, assignment, sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.models.task_modules.anchor_generator import AnchorGenerator
from rsprompter_tpu.models.task_modules.assigners import max_iou_assign
from rsprompter_tpu.models.task_modules.samplers import random_sample_padded


def test_anchor_generator_shapes_and_centers():
    gen = AnchorGenerator(strides=[4, 8], ratios=[0.5, 1.0, 2.0], scales=[8])
    assert gen.num_base_priors == 3
    anchors = gen.grid_anchors([(4, 4), (2, 2)])
    assert anchors[0].shape == (4 * 4 * 3, 4)
    assert anchors[1].shape == (2 * 2 * 3, 4)
    # ratio=1 anchor at cell (0,0), stride 4: centered box of size 32
    sq = anchors[0][1]
    np.testing.assert_allclose(sq, [-16, -16, 16, 16])
    # second cell shifted by stride along x
    np.testing.assert_allclose(anchors[0][4] - anchors[0][1], [4, 0, 4, 0])


def test_max_iou_assign_basic():
    priors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 9], [50, 50, 60, 60], [100, 100, 110, 110]],
        jnp.float32,
    )
    gts = jnp.asarray([[0, 0, 10, 10], [49, 50, 60, 60]], jnp.float32)
    labels = jnp.asarray([3, 7], jnp.int32)
    valid = jnp.asarray([True, True])
    res = max_iou_assign(priors, gts, labels, valid, 0.7, 0.3, 0.3)
    np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, 1, 2, 0])
    np.testing.assert_array_equal(np.asarray(res.labels), [3, 3, 7, -1])


def test_max_iou_assign_low_quality_claims_best_prior():
    # gt overlaps one prior at 0.4 (< pos 0.7 but >= min_pos 0.3)
    priors = jnp.asarray([[0, 0, 10, 25], [200, 200, 210, 210]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    res = max_iou_assign(
        priors, gts, jnp.zeros(1, jnp.int32), jnp.asarray([True]), 0.7, 0.3, 0.3
    )
    assert int(res.gt_inds[0]) == 1


def test_max_iou_assign_ignores_invalid_gt():
    priors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    res = max_iou_assign(
        priors, gts, jnp.zeros(1, jnp.int32), jnp.asarray([False]), 0.7, 0.3, 0.3
    )
    assert int(res.gt_inds[0]) == 0  # negative, not positive


def test_random_sampler_counts_and_packing():
    rng = jax.random.PRNGKey(0)
    # 10 pos, 200 neg, 40 ignore
    assigned = jnp.concatenate(
        [
            jnp.ones(10, jnp.int32),
            jnp.zeros(200, jnp.int32),
            -jnp.ones(40, jnp.int32),
        ]
    )
    s = random_sample_padded(rng, assigned, num=64, pos_fraction=0.25)
    assert s.inds.shape == (64,)
    np_pos = np.asarray(s.is_pos)
    assert np_pos.sum() == 10  # all 10 positives (< 16 expected)
    assert np.asarray(s.valid).sum() == 64
    # positives packed first
    assert np_pos[:10].all() and not np_pos[10:].any()
    # sampled negatives are actual negatives
    inds = np.asarray(s.inds)
    assert (np.asarray(assigned)[inds[10:]] == 0).all()


def test_random_sampler_caps_positives():
    rng = jax.random.PRNGKey(1)
    assigned = jnp.concatenate([jnp.ones(100, jnp.int32), jnp.zeros(100, jnp.int32)])
    s = random_sample_padded(rng, assigned, num=64, pos_fraction=0.25)
    assert np.asarray(s.is_pos).sum() == 16


def test_auction_match_reaches_hungarian_optimum():
    """On-device auction (the TPU path — axon has no host callbacks) lands
    within G*eps of scipy's optimal total cost on random instances, and
    produces a valid one-to-one assignment."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    import jax.numpy as jnp
    from rsprompter_tpu.models.task_modules.hungarian import auction_match

    rs = np.random.RandomState(0)
    for trial in range(8):
        q, g = 40, rs.randint(1, 20)
        cost = rs.randn(q, g).astype(np.float32) * 3.0
        valid = rs.rand(g) > 0.3
        out = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
        vidx = np.flatnonzero(valid)
        # invalid gts unmatched
        assert (out[~valid] == -1).all()
        if len(vidx) == 0:
            continue
        # valid gts matched to distinct queries
        picks = out[vidx]
        assert (picks >= 0).all() and len(set(picks.tolist())) == len(picks)
        total = cost[picks, vidx].sum()
        rows, cols = linear_sum_assignment(cost[:, vidx])
        opt = cost[rows, vidx[cols]].sum()
        assert total <= opt + len(vidx) * 1e-3 + 1e-4, (trial, total, opt)


def test_auction_match_empty_and_full():
    import numpy as np
    import jax.numpy as jnp
    from rsprompter_tpu.models.task_modules.hungarian import auction_match

    cost = jnp.zeros((10, 4), jnp.float32)
    out = np.asarray(auction_match(cost, jnp.zeros((4,), bool)))
    assert (out == -1).all()
    out = np.asarray(auction_match(cost, jnp.ones((4,), bool)))
    assert sorted(set(out.tolist())) == sorted(out.tolist())  # distinct


def test_auction_match_realistic_scales_and_big_cost():
    """TPU-vs-scipy parity at the cost scales the query head actually emits
    (ADVICE r2): cls(~[-2,0]) + 5*bce(~[0,5]) + 5*dice(~[0,1]) mixtures,
    BIG_COST rows (masked/degenerate pairs), and NaN entries — NaN must be
    repulsive (match _lsa_host), and the assignment within G*eps of optimal."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    import jax.numpy as jnp
    from rsprompter_tpu.models.task_modules.hungarian import (
        BIG_COST,
        auction_match,
    )

    rs = np.random.RandomState(7)
    for trial in range(6):
        q, g = 100, rs.randint(2, 30)
        cost = (
            -rs.rand(q, g) * 2.0
            + rs.rand(q, g) * 25.0
            + rs.rand(q, g) * 5.0
        ).astype(np.float32)
        # sprinkle BIG_COST entries (repulsive pairs) and a NaN
        big_mask = rs.rand(q, g) < 0.1
        cost[big_mask] = BIG_COST
        cost[rs.randint(q), rs.randint(g)] = np.nan
        valid = np.ones(g, bool)
        out = np.asarray(auction_match(jnp.asarray(cost), jnp.asarray(valid)))
        picks = out[valid]
        assert (picks >= 0).all() and len(set(picks.tolist())) == len(picks)
        clean = np.where(np.isfinite(cost), cost, BIG_COST)
        rows, cols = linear_sum_assignment(clean)
        opt = clean[rows, cols].sum()
        total = clean[picks, np.flatnonzero(valid)].sum()
        # eps-auction bound; BIG_COST magnitudes don't break it because every
        # non-finite entry maps to the same repulsive plateau on both paths
        assert total <= opt + g * 1e-3 + 1e-2, (trial, total, opt)


def test_auction_match_more_gts_than_queries():
    """Over-subscribed case (valid gts > queries): the one-to-one guarantee
    must hold for as many gts as there are queries; the surplus stays -1
    instead of aliasing onto query 0 (ADVICE r2)."""
    import numpy as np
    import jax.numpy as jnp
    from rsprompter_tpu.models.task_modules.hungarian import auction_match

    q, g = 3, 6
    rs = np.random.RandomState(3)
    cost = rs.randn(q, g).astype(np.float32)
    out = np.asarray(
        auction_match(jnp.asarray(cost), jnp.ones((g,), bool), max_rounds=16)
    )
    matched = out[out >= 0]
    assert len(set(matched.tolist())) == len(matched)  # no aliasing
    assert len(matched) <= q
