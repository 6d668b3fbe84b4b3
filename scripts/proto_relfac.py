"""rel_factors variants: kill the minor-dim gather.

rel[q, kr] = (q . T[(qr - kr) + L-1]). Realignment of full = q @ T^T from
width 2L-1 to L is a per-row SHIFT: full[q, qr + j] with j = L-1-kr (the kr
flip absorbs into the expansion matrix for free). Variants:
  cur        production rel_factors (matmul + take_along_axis minor-dim gather)
  stair      staircase pad/flatten/reshape (zero gathers)
  geinsum    grouped einsum per qr/qc ('bhwc,hkc->bhwk', window-style)
  wnone      window kernel WITHOUT rel factors (isolate their cost @ windows)
  gnone      global kernel path with rel disabled

Usage: python scripts/proto_relfac.py [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perf_probe2 import timeit, chain  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    _fused_fwd,
    _resize_table,
    rel_factors,
)

B, GRID, HEADS, HD, WIN = 8, 64, 12, 64, 14
S = GRID * GRID
SW = WIN * WIN
NW = B * 25


def _mk(s_len, win=False):
    key = jax.random.PRNGKey(0)
    bsz = NW if win else B
    grid = WIN if win else GRID
    q = jax.random.normal(key, (bsz, HEADS, s_len, HD), jnp.bfloat16) * 0.05
    rh = jax.random.normal(jax.random.PRNGKey(1), (2 * grid - 1, HD), jnp.bfloat16) * 0.05
    return q, rh


def staircase_h(full, h, w):
    """full (bn, h, w, 2h-1) -> out[., qr, qc, j] = full[., qr, qc, qr+j], j<h.

    flat[qr*A + qc*(2h-1) + qr + j] with A = w*(2h-1)+1: pad the flattened
    row-block axis by h, reshape (h, A), drop the tail, reshape back.
    """
    bn = full.shape[0]
    width = 2 * h - 1
    a = w * width + 1
    flat = full.reshape(bn, h * w * width)
    flat = jnp.pad(flat, ((0, 0), (0, h * a - h * w * width)))
    x = flat.reshape(bn, h, a)[:, :, : w * width]
    return x.reshape(bn, h, w, width)[..., :h]


def staircase_w(full, h, w):
    """full (bn, h, w, 2w-1) -> out[., qr, qc, j] = full[., qr, qc, qc+j], j<w."""
    bn = full.shape[0]
    width = 2 * w - 1
    a = width + 1
    flat = full.reshape(bn * h, w * width)
    flat = jnp.pad(flat, ((0, 0), (0, w * a - w * width)))
    x = flat.reshape(bn * h, w, a)[:, :, :w]
    return x.reshape(bn, h, w, w)


def rel_factors_stair(q, rel_pos_h, rel_pos_w, hw):
    """Gather-free rel factors, FLIPPED j = L-1-kr column order."""
    h, w = hw
    b, n, s, d = q.shape
    th = _resize_table(rel_pos_h, 2 * h - 1).astype(q.dtype)
    tw = _resize_table(rel_pos_w, 2 * w - 1).astype(q.dtype)
    lmax = max(h, w)
    qf = q.reshape(b * n * s, d)
    full_h = (qf @ th.T).reshape(b * n, h, w, 2 * h - 1)
    full_w = (qf @ tw.T).reshape(b * n, h, w, 2 * w - 1)
    rel_h = staircase_h(full_h, h, w)
    rel_w = staircase_w(full_w, h, w)
    if h < lmax:
        rel_h = jnp.pad(rel_h, ((0, 0), (0, 0), (0, 0), (0, lmax - h)))
    if w < lmax:
        rel_w = jnp.pad(rel_w, ((0, 0), (0, 0), (0, 0), (0, lmax - w)))
    packed = jnp.concatenate([rel_h, rel_w], axis=-1)
    return packed.reshape(b, n, s, 2 * lmax)


def rel_factors_geinsum(q, rel_pos_h, rel_pos_w, hw):
    """Grouped-einsum variant (flipped columns like stair)."""
    h, w = hw
    b, n, s, d = q.shape
    th = _resize_table(rel_pos_h, 2 * h - 1).astype(q.dtype)
    tw = _resize_table(rel_pos_w, 2 * w - 1).astype(q.dtype)
    lmax = max(h, w)
    qg = q.reshape(b * n, h, w, d)
    ih = jnp.arange(h)[:, None] + jnp.arange(h)[None, :]  # [qr, j] -> qr+j
    iw = jnp.arange(w)[:, None] + jnp.arange(w)[None, :]
    th_g = th[ih]  # (h, h, d)
    tw_g = tw[iw]  # (w, w, d)
    rel_h = jnp.einsum("bhwc,hjc->bhwj", qg, th_g)
    rel_w = jnp.einsum("bhwc,wjc->bhwj", qg, tw_g)
    if h < lmax:
        rel_h = jnp.pad(rel_h, ((0, 0), (0, 0), (0, 0), (0, lmax - h)))
    if w < lmax:
        rel_w = jnp.pad(rel_w, ((0, 0), (0, 0), (0, 0), (0, lmax - w)))
    packed = jnp.concatenate([rel_h, rel_w], axis=-1)
    return packed.reshape(b, n, s, 2 * lmax)


def probe_cur():
    q, rh = _mk(S)

    def step(p, xx):
        return chain(xx, rel_factors(xx, rh, rh, (GRID, GRID)))

    return timeit(step, {}, q)


def probe_stair():
    q, rh = _mk(S)

    def step(p, xx):
        return chain(xx, rel_factors_stair(xx, rh, rh, (GRID, GRID)))

    return timeit(step, {}, q)


def probe_geinsum():
    q, rh = _mk(S)

    def step(p, xx):
        return chain(xx, rel_factors_geinsum(xx, rh, rh, (GRID, GRID)))

    return timeit(step, {}, q)


def probe_stair_win():
    q, rh = _mk(SW, win=True)

    def step(p, xx):
        return chain(xx, rel_factors_stair(xx, rh, rh, (WIN, WIN)))

    return timeit(step, {}, q)


def probe_cur_win():
    q, rh = _mk(SW, win=True)

    def step(p, xx):
        return chain(xx, rel_factors(xx, rh, rh, (WIN, WIN)))

    return timeit(step, {}, q)


def probe_wnone():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, 3 * HEADS, SW, HD), jnp.bfloat16) * 0.05

    def step(p, xx):
        return chain(xx, _fused_fwd(xx, None, None, (WIN, WIN)))

    return timeit(step, {}, qkv)


def probe_gnone():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, 3 * HEADS, S, HD), jnp.bfloat16) * 0.05

    def step(p, xx):
        return chain(xx, _fused_fwd(xx, None, None, (GRID, GRID)))

    return timeit(step, {}, qkv)


def probe_check():
    for hw, win in (((GRID, GRID), False), ((WIN, WIN), True)):
        q, rh = _mk(hw[0] * hw[1], win=win)
        ref = rel_factors(q, rh, rh, hw)
        lmax = max(hw)
        for name, fn in (("stair", rel_factors_stair), ("geinsum", rel_factors_geinsum)):
            out = fn(q, rh, rh, hw)
            # flip back: out[..., j] corresponds to ref[..., L-1-j] per half
            oh = out[..., :lmax][..., ::-1]
            ow = out[..., lmax:][..., ::-1]
            # flips include padding when h<lmax; here h==w==lmax so exact
            recon = jnp.concatenate([oh, ow], axis=-1)
            err = float(jnp.max(jnp.abs(recon.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"{name} {hw}: max err {err:.2e}")
    return 0.0


PROBES = {k[6:]: v for k, v in list(globals().items()) if k.startswith("probe_")}


def main():
    names = sys.argv[1:] or ["check", "cur", "stair", "geinsum", "cur_win", "stair_win", "wnone", "gnone"]
    for name in names:
        dt = PROBES[name]()
        if name != "check":
            print(f"{name:12s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
