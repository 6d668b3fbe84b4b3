"""Deformable attention core vs a direct numpy reference; point sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from rsprompter_tpu.ops.msdeform_attn import ms_deform_attn_core
from rsprompter_tpu.ops.point_utils import sample_mask_points, uncertain_point_coords


def _np_bilinear(img, y, x):
    """align_corners=False zero-pad bilinear at one point. img (H, W, C)."""
    h, w = img.shape[:2]
    x0, y0 = np.floor(x), np.floor(y)
    out = 0.0
    for (yy, xx, wgt) in [
        (y0, x0, (1 - (y - y0)) * (1 - (x - x0))),
        (y0, x0 + 1, (1 - (y - y0)) * (x - x0)),
        (y0 + 1, x0, (y - y0) * (1 - (x - x0))),
        (y0 + 1, x0 + 1, (y - y0) * (x - x0)),
    ]:
        if 0 <= yy < h and 0 <= xx < w:
            out = out + img[int(yy), int(xx)] * wgt
    return out


def test_ms_deform_attn_core_matches_numpy():
    rs = np.random.RandomState(0)
    b, q, heads, points, hd = 1, 3, 2, 2, 4
    shapes = [(6, 8), (3, 4)]
    values = [rs.randn(b, h, w, heads, hd).astype(np.float32) for h, w in shapes]
    locs = rs.rand(b, q, heads, len(shapes), points, 2).astype(np.float32)
    wts = rs.rand(b, q, heads, len(shapes), points).astype(np.float32)
    wts /= wts.sum(axis=(3, 4), keepdims=True)

    got = np.asarray(
        ms_deform_attn_core(
            [jnp.asarray(v) for v in values], jnp.asarray(locs), jnp.asarray(wts)
        )
    )

    ref = np.zeros((b, q, heads, hd))
    for qi in range(q):
        for hi in range(heads):
            for li, (hh, ww) in enumerate(shapes):
                for pi in range(points):
                    gx, gy = locs[0, qi, hi, li, pi]
                    # grid_sample align_corners=False pixel mapping
                    px = (gx * 2 - 1 + 1) * ww / 2 - 0.5
                    py = (gy * 2 - 1 + 1) * hh / 2 - 0.5
                    val = _np_bilinear(values[li][0, :, :, hi], py, px)
                    ref[0, qi, hi] += wts[0, qi, hi, li, pi] * val
    np.testing.assert_allclose(got, ref.reshape(b, q, heads * hd), atol=1e-5)


def test_uncertain_point_coords_shapes_and_ranges():
    rs = np.random.RandomState(1)
    masks = jnp.asarray(rs.randn(3, 16, 16).astype(np.float32))
    pts = uncertain_point_coords(
        jax.random.PRNGKey(0), masks, num_points=32, oversample_ratio=2.0,
        importance_sample_ratio=0.75,
    )
    assert pts.shape == (3, 32, 2)
    p = np.asarray(pts)
    assert (p >= 0).all() and (p <= 1).all()
    # importance points (first 24) target low-|logit| regions on average
    vals = np.abs(np.asarray(sample_mask_points(masks, pts)))
    assert vals[:, :24].mean() < vals[:, 24:].mean() + 0.5


def test_sample_mask_points_center_value():
    m = jnp.zeros((1, 4, 4)).at[0, 1:3, 1:3].set(1.0)
    v = sample_mask_points(m, jnp.asarray([[[0.5, 0.5]]]))
    assert float(v[0, 0]) == 1.0


def test_sample_mask_points_shared_matches_per_mask():
    from rsprompter_tpu.ops.point_utils import sample_mask_points_shared

    rng = jax.random.PRNGKey(3)
    masks = jax.random.normal(rng, (6, 17, 23))
    # include out-of-range points to exercise the zero-padding border
    pts = jax.random.uniform(
        jax.random.PRNGKey(4), (64, 2), minval=-0.1, maxval=1.1
    )
    ref = sample_mask_points(masks, jnp.broadcast_to(pts[None], (6,) + pts.shape))
    got = sample_mask_points_shared(masks, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sample_mask_points_matmul_matches_gather():
    from rsprompter_tpu.ops.point_utils import sample_mask_points_matmul

    masks = jax.random.normal(jax.random.PRNGKey(5), (4, 19, 27))
    pts = jax.random.uniform(
        jax.random.PRNGKey(6), (4, 96, 2), minval=-0.1, maxval=1.1
    )
    ref = sample_mask_points(masks, pts)
    got = sample_mask_points_matmul(masks, pts)
    # bf16 operands: ~0.4% relative tolerance
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.02, rtol=0.01)

    # gradients w.r.t. the masks agree too (backward = matmuls, not scatter)
    g_ref = jax.grad(lambda m: (sample_mask_points(m, pts) ** 2).sum())(masks)
    g_got = jax.grad(lambda m: (sample_mask_points_matmul(m, pts) ** 2).sum())(masks)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=0.05, rtol=0.02)
