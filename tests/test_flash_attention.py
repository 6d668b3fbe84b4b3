"""Flash attention parity vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsprompter_tpu.ops.attention import attention_rel_pos
from rsprompter_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels interpreted on CPU."""
    import functools
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    yield


def _rand_qkv(rs, b, n, h, w, d):
    s = h * w
    q = rs.randn(b, n, s, d).astype(np.float32)
    k = rs.randn(b, n, s, d).astype(np.float32)
    v = rs.randn(b, n, s, d).astype(np.float32)
    rh = (rs.randn(2 * h - 1, d) * 0.1).astype(np.float32)
    rw = (rs.randn(2 * w - 1, d) * 0.1).astype(np.float32)
    return map(jnp.asarray, (q, k, v, rh, rw))


def test_flash_matches_xla_with_rel_pos():
    rs = np.random.RandomState(0)
    h = w = 8
    q, k, v, rh, rw = _rand_qkv(rs, 1, 2, h, w, 32)
    ref = attention_rel_pos(q, k, v, (h, w), rh, rw, impl="xla")
    got = fa.flash_attention_rel_pos(q, k, v, (h, w), rh, rw, block_q=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_matches_xla_no_bias():
    rs = np.random.RandomState(1)
    h = w = 4
    q, k, v, _, _ = _rand_qkv(rs, 2, 2, h, w, 16)
    ref = attention_rel_pos(q, k, v, (h, w), None, None, impl="xla")
    got = fa.flash_attention_rel_pos(q, k, v, (h, w), None, None, block_q=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_gradients_match_xla():
    rs = np.random.RandomState(2)
    h = w = 4
    q, k, v, rh, rw = _rand_qkv(rs, 1, 1, h, w, 16)

    def loss_ref(q, k, v):
        return (attention_rel_pos(q, k, v, (h, w), rh, rw, impl="xla") ** 2).sum()

    def loss_flash(q, k, v):
        return (fa.flash_attention_rel_pos(q, k, v, (h, w), rh, rw, block_q=16) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_chunked_reference_matches():
    rs = np.random.RandomState(3)
    h = w = 8
    q, k, v, rh_t, rw_t = _rand_qkv(rs, 1, 2, h, w, 16)
    from rsprompter_tpu.ops.attention import decomposed_rel_pos_tables

    rh_tab, rw_tab = decomposed_rel_pos_tables(rh_t, rw_t, (h, w), (h, w))
    bn = 2
    s = h * w
    qf = q.reshape(bn, s, 16)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", qf.reshape(bn, h, w, 16), rh_tab).reshape(bn, s, h)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", qf.reshape(bn, h, w, 16), rw_tab).reshape(bn, s, w)
    out = fa._attention_ref_chunked(
        qf, k.reshape(bn, s, 16), v.reshape(bn, s, 16), rel_h, rel_w,
        16 ** -0.5, (h, w), chunk=16,
    )
    ref = attention_rel_pos(q, k, v, (h, w), rh_t, rw_t, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.reshape(bn, s, 16)), atol=2e-5
    )
