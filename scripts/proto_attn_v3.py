"""Prototype v3 attention kernels: phase-batched MXU/VPU + fewer softmax passes.

Hypotheses from perf_micro (r2):
  * global kernel (8.6 ms) is VPU-bound: ~1.6e9 exps + max + sum + scale
    passes over fp32 (512, 4096) scores. Cut passes: fold scale*LOG2E into q
    upstream (free), sum via ones-column appended to v (MXU, free N-tile),
    phase-batch the two heads per cell.
  * window kernel (4.0 ms) is latency-bound: 12 sequential heads, each a
    tiny-matmul -> VPU -> tiny-matmul dependency chain. Phase-batch all 12
    heads (all QK+bias, then all softmax, then all PV).

Usage: python scripts/proto_attn_v3.py [g_cur g_phase w_cur w_phase check ...]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf_probe2 import timeit, chain  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    _expansion_matrix,
    _fused_fwd,
    rel_factors,
)

B, GRID, HEADS, HD, WIN = 8, 64, 12, 64, 14
S = GRID * GRID
SW = WIN * WIN
NW = B * 25
LOG2E = 1.4426950408889634


def _mk_global():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, 3 * HEADS, S, HD), jnp.bfloat16) * 0.05
    rh = jax.random.normal(jax.random.PRNGKey(1), (2 * GRID - 1, HD), jnp.bfloat16) * 0.05
    return qkv, rh


def _mk_win():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, 3 * HEADS, SW, HD), jnp.bfloat16) * 0.05
    rh = jax.random.normal(jax.random.PRNGKey(1), (2 * WIN - 1, HD), jnp.bfloat16) * 0.05
    return qkv, rh


# ---------------- current production (kernel incl. rel_factors) -------------


def probe_g_cur():
    qkv, rh = _mk_global()

    def step(p, xx):
        return chain(xx, _fused_fwd(xx, rh, rh, (GRID, GRID)))

    return timeit(step, {}, qkv)


def probe_w_cur():
    qkv, rh = _mk_win()

    def step(p, xx):
        return chain(xx, _fused_fwd(xx, rh, rh, (WIN, WIN)))

    return timeit(step, {}, qkv)


# ---------------- v3 global: phase-batched + prescale + MXU row-sum ---------


def _g_kernel_v3(q_ref, k_ref, v_ref, f_ref, e_ref, o_ref, *, mxu_sum):
    """One (batch, head-pair, q-block) cell; q and f arrive PRESCALED by
    scale*LOG2E and LOG2E. Phases: both heads' scores (MXU), both softmaxes
    (VPU), both PVs (MXU)."""
    e = e_ref[...]
    ss = []
    for j in range(2):
        s = jax.lax.dot_general(
            q_ref[0, 0, j], k_ref[0, 0, j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ss.append(s + jax.lax.dot(f_ref[0, 0, j], e, preferred_element_type=jnp.float32))
    ps = []
    for j in range(2):
        m = jnp.max(ss[j], axis=-1, keepdims=True)
        ps.append(jnp.exp2(ss[j] - m).astype(v_ref.dtype))
    for j in range(2):
        v = v_ref[0, 0, j]
        if mxu_sum:
            ones = jnp.ones((v.shape[0], 1), v.dtype)
            vp = jnp.concatenate([v, ones], axis=-1)  # (S, d+1): same N tile
            ol = jax.lax.dot(ps[j], vp, preferred_element_type=jnp.float32)
            o_ref[0, 0, j] = (ol[:, :HD] / ol[:, HD:]).astype(o_ref.dtype)
        else:
            l = jnp.sum(ps[j].astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot(ps[j], v, preferred_element_type=jnp.float32)
            o_ref[0, 0, j] = (o / l).astype(o_ref.dtype)


def _g_v3(qkv, rh, rw, mxu_sum=True, bq=512):
    b, n3, s, d = qkv.shape
    n = n3 // 3
    scale = d ** -0.5
    lmax = GRID
    q_scaled = qkv[:, :n] * jnp.asarray(scale * LOG2E, qkv.dtype)
    factors = rel_factors(qkv[:, :n], rh, rw, (GRID, GRID)) * jnp.asarray(
        LOG2E, qkv.dtype
    )
    e = _expansion_matrix((GRID, GRID), qkv.dtype)
    kv = qkv[:, n:]
    hp = n // 2
    q_p = q_scaled.reshape(b, hp, 2, s, d)
    k_p = kv[:, :n].reshape(b, hp, 2, s, d)
    v_p = kv[:, n:].reshape(b, hp, 2, s, d)
    fac_p = factors.reshape(b, hp, 2, s, 2 * lmax)
    kernel = functools.partial(_g_kernel_v3, mxu_sum=mxu_sum)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hp, 2, s, d), qkv.dtype),
        grid=(b, hp, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, 2, bq, d), lambda b_, p, i: (b_, p, 0, i, 0)),
            pl.BlockSpec((1, 1, 2, s, d), lambda b_, p, i: (b_, p, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, s, d), lambda b_, p, i: (b_, p, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2, bq, 2 * lmax), lambda b_, p, i: (b_, p, 0, i, 0)),
            pl.BlockSpec((2 * lmax, s), lambda b_, p, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, bq, d), lambda b_, p, i: (b_, p, 0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q_p, k_p, v_p, fac_p, e)
    return out.reshape(b, n, s, d)


def probe_g_phase():
    qkv, rh = _mk_global()

    def step(p, xx):
        return chain(xx, _g_v3(xx, rh, rh, mxu_sum=False))

    return timeit(step, {}, qkv)


def probe_g_mxusum():
    qkv, rh = _mk_global()

    def step(p, xx):
        return chain(xx, _g_v3(xx, rh, rh, mxu_sum=True))

    return timeit(step, {}, qkv)


# ---------------- v3 window: phase-batched heads ----------------------------


def _w_kernel_v3(qkv_ref, f_ref, e_ref, o_ref, *, heads, wpc):
    e = e_ref[...]
    ss = []
    for wi in range(wpc):
        for nh in range(heads):
            s = jax.lax.dot_general(
                qkv_ref[wi, nh], qkv_ref[wi, heads + nh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ss.append(s + jax.lax.dot(f_ref[wi, nh], e, preferred_element_type=jnp.float32))
    ps = []
    for idx in range(wpc * heads):
        m = jnp.max(ss[idx], axis=-1, keepdims=True)
        ps.append(jnp.exp2(ss[idx] - m).astype(qkv_ref.dtype))
    for wi in range(wpc):
        for nh in range(heads):
            idx = wi * heads + nh
            l = jnp.sum(ps[idx].astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot(ps[idx], qkv_ref[wi, 2 * heads + nh],
                            preferred_element_type=jnp.float32)
            o_ref[wi, nh] = (o / l).astype(o_ref.dtype)


def _w_v3(qkv, rh, rw, wpc=1):
    nw, n3, s, d = qkv.shape
    n = n3 // 3
    scale = d ** -0.5
    factors = rel_factors(qkv[:, :n], rh, rw, (WIN, WIN)) * jnp.asarray(
        LOG2E, qkv.dtype
    )
    q_scaled = qkv[:, :n] * jnp.asarray(scale * LOG2E, qkv.dtype)
    qkv = jnp.concatenate([q_scaled, qkv[:, n:]], axis=1)
    e = _expansion_matrix((WIN, WIN), qkv.dtype)
    kernel = functools.partial(_w_kernel_v3, heads=n, wpc=wpc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw, n, s, d), qkv.dtype),
        grid=(nw // wpc,),
        in_specs=[
            pl.BlockSpec((wpc, n3, s, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((wpc, n, s, 2 * WIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2 * WIN, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((wpc, n, s, d), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, factors, e)


def probe_w_phase():
    qkv, rh = _mk_win()

    def step(p, xx):
        return chain(xx, _w_v3(xx, rh, rh, wpc=1))

    return timeit(step, {}, qkv)


def probe_w_phase2():
    qkv, rh = _mk_win()

    def step(p, xx):
        return chain(xx, _w_v3(xx, rh, rh, wpc=2))

    return timeit(step, {}, qkv)


def probe_w_phase4():
    qkv, rh = _mk_win()

    def step(p, xx):
        return chain(xx, _w_v3(xx, rh, rh, wpc=4))

    return timeit(step, {}, qkv)


def probe_check():
    qkv, rh = _mk_global()
    ref = _fused_fwd(qkv, rh, rh, (GRID, GRID))
    for name, out in [
        ("g_phase", _g_v3(qkv, rh, rh, mxu_sum=False)),
        ("g_mxusum", _g_v3(qkv, rh, rh, mxu_sum=True)),
    ]:
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"max |{name} - cur| = {err:.2e}")
    qkvw, rhw = _mk_win()
    refw = _fused_fwd(qkvw, rhw, rhw, (WIN, WIN))
    for wpc in (1, 2):
        outw = _w_v3(qkvw, rhw, rhw, wpc=wpc)
        err = float(jnp.max(jnp.abs(outw.astype(jnp.float32) - refw.astype(jnp.float32))))
        print(f"max |w_phase{wpc} - cur| = {err:.2e}")
    return 0.0


PROBES = {k[6:]: v for k, v in list(globals().items()) if k.startswith("probe_")}


def main():
    names = sys.argv[1:] or ["check", "g_cur", "g_phase", "g_mxusum", "w_cur", "w_phase", "w_phase2", "w_phase4"]
    for name in names:
        dt = PROBES[name]()
        if name != "check":
            print(f"{name:12s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
