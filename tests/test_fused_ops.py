"""Tests for the fused TPU hot-path ops (CPU: Pallas interpret mode).

Covers the v2 encoder path: packed-qkv fused attention (global + window
kernels), big-matmul rel-pos factors, the fused LN+MLP+residual kernel, the
space-to-depth patch embed, and param-tree/numerics parity of the fused
encoder against the XLA reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsprompter_tpu.models.sam.configs import sam_config
from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder
from rsprompter_tpu.ops.attention import attention_rel_pos
from rsprompter_tpu.ops.fused_mlp import _xla_reference, fused_mlp_residual
from rsprompter_tpu.ops.fused_vit_attention import (
    _pack_pairs,
    _pair_bwd_pallas,
    _reference_attention,
    _unpack_pairs,
    fused_qkv_attention,
    rel_factors,
)


def _rand(key, shape, scale=0.3):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * scale


@pytest.mark.parametrize("hw,heads", [((8, 8), 4), ((14, 14), 2), ((32, 32), 2)])
def test_fused_attention_matches_xla(hw, heads):
    h, w = hw
    s = h * w
    qkv = _rand(0, (2, 3 * heads, s, 64))
    th = _rand(1, (2 * h - 1, 64), 0.2)
    tw = _rand(2, (2 * w - 1, 64), 0.2)
    out = fused_qkv_attention(qkv, th, tw, hw)
    ref = attention_rel_pos(
        qkv[:, :heads], qkv[:, heads : 2 * heads], qkv[:, 2 * heads :],
        hw, th, tw, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_interpolated_tables():
    """Table length != 2L-1 exercises the trace-time resize path."""
    h = w = 8
    qkv = _rand(0, (1, 12, h * w, 64))
    th = _rand(1, (11, 64), 0.2)
    out = fused_qkv_attention(qkv, th, th, (h, w))
    ref = attention_rel_pos(
        qkv[:, :4], qkv[:, 4:8], qkv[:, 8:], (h, w), th, th, impl="xla"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_no_tables():
    h = w = 8
    qkv = _rand(0, (1, 12, h * w, 64))
    out = fused_qkv_attention(qkv, None, None, (h, w))
    ref = attention_rel_pos(
        qkv[:, :4], qkv[:, 4:8], qkv[:, 8:], (h, w), None, None, impl="xla"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("hw,pairs", [((14, 14), 2), ((32, 32), 1)])
def test_pair_bwd_pallas_matches_reference(hw, pairs):
    """The Pallas backward (window kernel at S<=512, global accumulating
    kernel above) must match the XLA-recompute vjp for qkv AND both rel-pos
    tables. (32, 32) -> S=1024 drives the global kernel's dK/dV accumulation
    across 4 q-blocks."""
    h, w = hw
    s = h * w
    qkv_pair = _rand(0, (1, 3 * pairs, s, 128))
    th = _rand(1, (2 * h - 1, 64), 0.2)
    tw = _rand(2, (2 * w - 1, 64), 0.2)
    g = _rand(3, (1, pairs, s, 128))

    def ref(qp, a, b):
        return _pack_pairs(_reference_attention(_unpack_pairs(qp), a, b, hw))

    _, vjp = jax.vjp(ref, qkv_pair, th, tw)
    want = vjp(g)
    got = _pair_bwd_pallas(qkv_pair, th, tw, g, hw)
    for name, a, b in zip(("dqkv", "dth", "dtw"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4, err_msg=name
        )


def test_pair_bwd_pallas_no_tables():
    hw = (14, 14)
    s = hw[0] * hw[1]
    qkv_pair = _rand(0, (2, 3, s, 128))
    g = _rand(3, (2, 1, s, 128))

    def ref(qp):
        return _pack_pairs(_reference_attention(_unpack_pairs(qp), None, None, hw))

    _, vjp = jax.vjp(ref, qkv_pair)
    (want,) = vjp(g)
    dqkv, dth, dtw = _pair_bwd_pallas(qkv_pair, None, None, g, hw)
    assert dth is None and dtw is None
    np.testing.assert_allclose(
        np.asarray(dqkv), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_fused_attention_grad_matches_reference():
    h = w = 8
    qkv = _rand(0, (1, 12, h * w, 64))
    th = _rand(1, (15, 64), 0.2)

    g_fused = jax.grad(
        lambda a, t: fused_qkv_attention(a, t, t, (h, w)).sum(), argnums=(0, 1)
    )(qkv, th)
    g_ref = jax.grad(
        lambda a, t: _reference_attention(a, t, t, (h, w)).sum(), argnums=(0, 1)
    )(qkv, th)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rel_factors_match_gathered_tables():
    """Staircase big-matmul factors == einsum over pre-gathered tables.

    rel_factors emits the FLIPPED column order (entry j <-> key offset
    L-1-j, absorbed into the expansion matrix), so flip before comparing.
    """
    from rsprompter_tpu.ops.attention import decomposed_rel_pos_tables

    h, w, n = 33, 33, 2  # odd grid > 512 tokens exercises the global branch
    s = h * w
    q = _rand(0, (1, n, s, 64))
    th = _rand(1, (2 * h - 1, 64), 0.2)
    tw = _rand(2, (2 * w - 1, 64), 0.2)
    packed = rel_factors(q, th, tw, (h, w))
    rh_tab, rw_tab = decomposed_rel_pos_tables(th, tw, (h, w), (h, w))
    qg = np.asarray(q).reshape(n, h, w, 64)
    ref_h = np.einsum("nhwc,hkc->nhwk", qg, np.asarray(rh_tab))
    ref_w = np.einsum("nhwc,wkc->nhwk", qg, np.asarray(rw_tab))
    got = np.asarray(packed).reshape(n, h, w, 2 * h)
    np.testing.assert_allclose(got[..., :h][..., ::-1], ref_h, atol=1e-4)
    np.testing.assert_allclose(got[..., h:][..., ::-1], ref_w, atol=1e-4)


def test_rel_factors_flip_consistency_window_branch():
    """Window (einsum) branch emits the same flipped layout as the global
    (staircase) branch, and the expansion matrix undoes the flip: the
    expanded bias must equal the directly-gathered decomposed bias."""
    from rsprompter_tpu.ops.attention import decomposed_rel_pos_tables
    from rsprompter_tpu.ops.fused_vit_attention import _expansion_matrix

    h, w, n = 7, 7, 2  # s = 49 <= 512 -> window branch
    s = h * w
    q = _rand(0, (1, n, s, 64))
    th = _rand(1, (2 * h - 1, 64), 0.2)
    tw = _rand(2, (2 * w - 1, 64), 0.2)
    packed = np.asarray(rel_factors(q, th, tw, (h, w)))  # (1, n, s, 2h)
    e = np.asarray(_expansion_matrix((h, w), jnp.float32))  # (2h, s)
    bias = packed.astype(np.float32) @ e  # (1, n, s, s)

    rh_tab, rw_tab = decomposed_rel_pos_tables(th, tw, (h, w), (h, w))
    qg = np.asarray(q).reshape(n, h, w, 64)
    ref_h = np.einsum("nhwc,hkc->nhwk", qg, np.asarray(rh_tab))
    ref_w = np.einsum("nhwc,wkc->nhwk", qg, np.asarray(rw_tab))
    ref = (ref_h[..., :, None] + ref_w[..., None, :]).reshape(n, s, s)
    np.testing.assert_allclose(bias[0], ref, atol=1e-4)


def test_fused_mlp_matches_xla_reference():
    c, m, t = 64, 256, 4096
    x = _rand(0, (t, c)).astype(jnp.float32)
    ls = jnp.abs(_rand(1, (c,), 1.0)) + 0.5
    lb = _rand(2, (c,), 0.1)
    w1 = _rand(3, (c, m), 0.1)
    b1 = _rand(4, (m,), 0.1)
    w2 = _rand(5, (m, c), 0.1)
    b2 = _rand(6, (c,), 0.1)
    out = fused_mlp_residual(x, ls, lb, w1, b1, w2, b2, 1e-6)
    ref = _xla_reference(x, ls, lb, w1, b1, w2, b2, 1e-6)
    # fp32: only the polynomial-erf gelu differs (|err| <= 1.5e-7 in erf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_mlp_bwd_pallas_matches_reference():
    """The fused MLP Pallas backward (resident fp32 weight-grad accumulators
    over the token-block sweep) must match the XLA-recompute vjp for every
    input: x, LN scale/bias, W1/b1, W2/b2."""
    from rsprompter_tpu.ops.fused_mlp import _mlp_bwd_pallas

    c, m, t = 64, 256, 2048
    x = _rand(0, (t, c)).astype(jnp.float32)
    ls = jnp.abs(_rand(1, (c,), 1.0)) + 0.5
    lb = _rand(2, (c,), 0.1)
    w1 = _rand(3, (c, m), 0.1)
    b1 = _rand(4, (m,), 0.1)
    w2 = _rand(5, (m, c), 0.1)
    b2 = _rand(6, (c,), 0.1)
    g = _rand(7, (t, c))

    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, 1e-6), x, ls, lb, w1, b1, w2, b2
    )
    want = vjp(g)
    got = _mlp_bwd_pallas(x, ls, lb, w1, b1, w2, b2, 1e-6, g)
    names = ("dx", "dscale", "dbias", "dw1", "db1", "dw2", "db2")
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4, err_msg=name
        )


def test_ln_qkv_bwd_pallas_matches_reference():
    """fused_ln_qkv Pallas backward: the pair-packed cotangent is re-flattened
    in VMEM and dW/db/LN grads accumulate across token blocks."""
    from rsprompter_tpu.ops.fused_mlp import _ln_qkv_bwd_pallas, _ln_qkv_xla

    c, heads3, batch, s = 64, 6, 2, 512
    t, k = batch * s, heads3 * 64
    x = _rand(0, (t, c)).astype(jnp.float32)
    ls = jnp.abs(_rand(1, (c,), 1.0)) + 0.5
    lb = _rand(2, (c,), 0.1)
    w = _rand(3, (c, k), 0.1)
    b = _rand(4, (k,), 0.1)
    g = _rand(5, (batch, heads3 // 2, s, 128))

    def ref(x, ls, lb, w, b):
        y = _ln_qkv_xla(x, ls, lb, w, b, 1e-6, heads3)
        return y.reshape(batch, s, heads3 // 2, 128).transpose(0, 2, 1, 3)

    _, vjp = jax.vjp(ref, x, ls, lb, w, b)
    want = vjp(g)
    got = _ln_qkv_bwd_pallas(x, ls, lb, w, b, 1e-6, heads3, batch, g)
    for name, a, bb in zip(("dx", "dls", "dlb", "dw", "db"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=1e-4, err_msg=name
        )


def test_qkv_window_bwd_pallas_matches_reference():
    """fused_qkv_window_pair Pallas backward: dX strips write straight back
    to the grid; dW/db accumulate across the (batch, strip) sweep."""
    from rsprompter_tpu.ops.fused_mlp import (
        _qkv_window_bwd_pallas,
        _window_grid_ref,
    )

    c, heads3, window = 64, 6, 8
    b_, hp, wp = 2, 16, 24  # 2x3 windows per image
    x = _rand(0, (b_, hp, wp, c)).astype(jnp.float32)
    w = _rand(1, (c, heads3 * 64), 0.1)
    b = _rand(2, (heads3 * 64,), 0.1)
    nwin = (hp // window) * (wp // window)
    g = _rand(3, (b_ * nwin, heads3 // 2, window * window, 128))

    _, vjp = jax.vjp(lambda *a: _window_grid_ref(*a, heads3, window), x, w, b)
    want = vjp(g)
    got = _qkv_window_bwd_pallas(x, w, b, heads3, window, g)
    for name, a, bb in zip(("dx", "dw", "db"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=5e-4, rtol=1e-4, err_msg=name
        )


def test_fused_mlp_grad_finite():
    c, m, t = 64, 256, 4096
    x = _rand(0, (t, c))
    ls = jnp.ones((c,)); lb = jnp.zeros((c,))
    w1 = _rand(1, (c, m), 0.1); b1 = jnp.zeros((m,))
    w2 = _rand(2, (m, c), 0.1); b2 = jnp.zeros((c,))
    g = jax.grad(
        lambda *a: fused_mlp_residual(*a, 1e-6).sum(), argnums=(0, 3, 5)
    )(x, ls, lb, w1, b1, w2, b2)
    assert all(bool(jnp.isfinite(a).all()) for a in g)


def test_encoder_grads_pallas_bwd_dispatch(monkeypatch):
    """RSPROMPTER_PALLAS_BWD=force runs every Pallas backward (attention
    pair window+global, ln_qkv, window-strip qkv, MLP) through the REAL
    custom_vjp dispatch on a small 2-layer encoder; grads must match the
    XLA-recompute backwards (=0). Guards the residual/argument wiring the
    per-kernel parity tests bypass."""
    from rsprompter_tpu.models.sam.configs import SamVisionConfig

    cfg = SamVisionConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
        global_attn_indexes=(1,), image_size=512, window_size=8,
    )
    enc = SamVisionEncoder(config=cfg, attn_impl="fused")
    x = _rand(0, (2, 512, 512, 3), 1.0)
    params = enc.init(jax.random.PRNGKey(0), x, output_hidden_states=False)

    def loss(p):
        return enc.apply(p, x, output_hidden_states=False).sum()

    monkeypatch.setenv("RSPROMPTER_PALLAS_BWD", "0")
    g_xla = jax.grad(loss)(params)
    monkeypatch.setenv("RSPROMPTER_PALLAS_BWD", "force")
    g_pallas = jax.grad(loss)(params)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pallas)
    assert len(flat_x) == len(flat_p)
    for (path, a), (_, b) in zip(flat_x, flat_p):
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_encoder_matches_xla_encoder():
    """Same params, same outputs (fp32 tolerance), identical param trees."""
    cfg = sam_config("base", image_size=256).vision_config
    x = _rand(0, (1, 256, 256, 3), 1.0)
    m_ref = SamVisionEncoder(config=cfg, attn_impl="xla")
    m_fused = SamVisionEncoder(config=cfg, attn_impl="fused")
    p = m_ref.init(jax.random.PRNGKey(0), x)
    p2 = m_fused.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    ref_out, ref_hs = m_ref.apply(p, x)
    fus_out, fus_hs = m_fused.apply(p, x)
    np.testing.assert_allclose(
        np.asarray(fus_out), np.asarray(ref_out), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(fus_hs[-1]), np.asarray(ref_hs[-1]), atol=5e-5
    )


def test_patch_embed_space_to_depth_equals_conv():
    import flax.linen as nn

    from rsprompter_tpu.models.sam.vision_encoder import SamPatchEmbeddings

    x = _rand(0, (1, 64, 64, 3), 1.0)
    pe = SamPatchEmbeddings(hidden_size=32, patch_size=16)
    p = pe.init(jax.random.PRNGKey(0), x)
    out = pe.apply(p, x)

    conv = nn.Conv(32, kernel_size=(16, 16), strides=(16, 16), padding="VALID")
    cp = {"params": p["params"]["projection"]}
    ref = conv.apply(cp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("hw,heads", [((8, 8), 4), ((14, 14), 2), ((32, 32), 2)])
def test_pair_packed_window_attention_matches_xla(hw, heads):
    """Pair-packed lanes (two heads side by side) == per-head XLA reference."""
    from rsprompter_tpu.ops.fused_vit_attention import (
        _pack_pairs,
        _unpack_pairs,
        fused_qkv_attention_pair,
    )

    h, w = hw
    s = h * w
    qkv = _rand(0, (2, 3 * heads, s, 64))
    th = _rand(1, (2 * h - 1, 64), 0.2)
    tw = _rand(2, (2 * w - 1, 64), 0.2)
    qkv_p = _pack_pairs(qkv)
    np.testing.assert_allclose(  # pack/unpack are inverses
        np.asarray(_unpack_pairs(qkv_p)), np.asarray(qkv), atol=0
    )
    out = _unpack_pairs(fused_qkv_attention_pair(qkv_p, th, tw, hw))
    ref = attention_rel_pos(
        qkv[:, :heads], qkv[:, heads : 2 * heads], qkv[:, 2 * heads :],
        hw, th, tw, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # gradients flow through the XLA recompute backward
    g_pair = jax.grad(
        lambda a, t: fused_qkv_attention_pair(a, t, t, hw).sum(), argnums=(0, 1)
    )(qkv_p, th)
    g_ref = jax.grad(
        lambda a, t: fused_qkv_attention(a, t, t, hw).sum(), argnums=(0, 1)
    )(qkv, th)
    np.testing.assert_allclose(
        np.asarray(_unpack_pairs(g_pair[0])), np.asarray(g_ref[0]), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(g_pair[1]), np.asarray(g_ref[1]), atol=2e-5)


@pytest.mark.parametrize("hw,attn_mode,lse_mode", [
    ((32, 32), "tiled", ""),     # k-tiled global kernel (the default)
    ((32, 32), "full", ""),      # full-scores global kernel, VPU denominator
    ((32, 32), "full", "dot"),   # full global, MXU denominator via ones-dot
    ((32, 32), "full", "concat"),  # full global, denominator folded into PV
    ((8, 8), "tiled", "dot"),    # window kernel with each MXU-LSE mode
    ((8, 8), "tiled", "concat"),
])
def test_attention_env_modes_parity(monkeypatch, hw, attn_mode, lse_mode):
    """Every RSPROMPTER_GLOBAL_ATTN x RSPROMPTER_MXU_LSE combination must
    match the XLA reference (ADVICE r4: when 'tiled' became the default, the
    full-scores global kernel and the MXU-LSE modes fell out of coverage).

    Both gates are read at TRACE time (``_global_attn_mode`` /
    ``_mxu_denominator_mode``): a jitted caller compiled under one setting
    keeps it for the life of the compile cache entry and silently ignores
    later env changes — these eager calls re-trace, so each combination
    genuinely dispatches its kernel."""
    from rsprompter_tpu.ops.fused_vit_attention import (
        _pack_pairs,
        _unpack_pairs,
        fused_qkv_attention_pair,
    )

    monkeypatch.setenv("RSPROMPTER_GLOBAL_ATTN", attn_mode)
    monkeypatch.setenv("RSPROMPTER_MXU_LSE", lse_mode)
    h, w = hw
    s = h * w
    heads = 2
    qkv = _rand(0, (1, 3 * heads, s, 64))
    th = _rand(1, (2 * h - 1, 64), 0.2)
    tw = _rand(2, (2 * w - 1, 64), 0.2)
    out = _unpack_pairs(
        fused_qkv_attention_pair(_pack_pairs(qkv), th, tw, hw)
    )
    ref = attention_rel_pos(
        qkv[:, :heads], qkv[:, heads : 2 * heads], qkv[:, 2 * heads :],
        hw, th, tw, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("pair", [False, True])
def test_safe_softmax_out_of_range_logits(pair):
    """|logits| >> 60 (from-scratch ViT instability regime): safe=True must
    match the exact reference; the default clamp is DOCUMENTED to diverge
    there (PARITY dev 8 / ADVICE r2) — assert both sides of the envelope."""
    from rsprompter_tpu.ops.fused_vit_attention import (
        _pack_pairs,
        _unpack_pairs,
        fused_qkv_attention_pair,
    )

    h = w = 8
    heads = 2
    s = h * w
    # scale qk so raw scores reach |s| ~ 200-800, far outside (-60, 60)
    qkv = _rand(0, (1, 3 * heads, s, 64), scale=5.0)
    ref = attention_rel_pos(
        qkv[:, :heads], qkv[:, heads : 2 * heads], qkv[:, 2 * heads :],
        (h, w), None, None, impl="xla",
    )
    scores = (
        np.einsum(
            "bnqd,bnkd->bnqk", np.asarray(qkv[:, :heads]),
            np.asarray(qkv[:, heads : 2 * heads]),
        )
        * 64 ** -0.5
    )
    assert np.abs(scores).max() > 60, "test setup must exceed the clamp range"
    if pair:
        qkv_p = _pack_pairs(qkv)
        safe = _unpack_pairs(
            fused_qkv_attention_pair(qkv_p, None, None, (h, w), True)
        )
        clamped = _unpack_pairs(
            fused_qkv_attention_pair(qkv_p, None, None, (h, w), False)
        )
    else:
        safe = fused_qkv_attention(qkv, None, None, (h, w), True)
        clamped = fused_qkv_attention(qkv, None, None, (h, w), False)
    np.testing.assert_allclose(np.asarray(safe), np.asarray(ref), atol=2e-5)
    # the clamp genuinely flattens out-of-range rows -> measurable divergence
    assert np.abs(np.asarray(clamped) - np.asarray(ref)).max() > 1e-2


def test_safe_softmax_in_range_matches_clamp():
    """Inside (-60, 60) both normalizations are exact and must agree."""
    h = w = 8
    heads = 2
    qkv = _rand(0, (1, 3 * heads, h * w, 64))
    th = _rand(1, (2 * h - 1, 64), 0.2)
    a = fused_qkv_attention(qkv, th, th, (h, w), True)
    b = fused_qkv_attention(qkv, th, th, (h, w), False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fast_conv_transpose_matches_flax():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from rsprompter_tpu.models.sam.mask_decoder import FastConvTranspose2x2

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 16))
    ref_mod = nn.ConvTranspose(8, (2, 2), strides=(2, 2))
    fast_mod = FastConvTranspose2x2(8)
    params = ref_mod.init(jax.random.PRNGKey(1), x)
    ref = ref_mod.apply(params, x)
    got = fast_mod.apply(params, x)  # identical param tree
    assert got.shape == ref.shape == (2, 10, 14, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)
