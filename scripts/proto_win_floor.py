"""Floor tests for the window-attention pallas call: how much of the 4 ms is
DMA/layout vs compute vs the XLA-side rel_factors?

  copy       same blocks as production, kernel just copies v heads -> out
  noe        production kernel but factors/E zeroed INSIDE (no f/e inputs)
  nof        production math, no f input streamed (bias = 0 in kernel)
  relonly    rel_factors einsum alone (XLA)
  fullprod   production _fused_fwd (reference point)

Usage: python scripts/proto_win_floor.py [names...]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perf_probe2 import timeit, chain  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    _attend_one,
    _fused_fwd,
    rel_factors,
)

B, HEADS, HD, WIN = 8, 12, 64, 14
SW = WIN * WIN
NW = B * 25


def _mk():
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, 3 * HEADS, SW, HD), jnp.bfloat16) * 0.05
    rh = jax.random.normal(jax.random.PRNGKey(1), (2 * WIN - 1, HD), jnp.bfloat16) * 0.05
    return qkv, rh


def _copy_kernel(qkv_ref, o_ref, *, heads):
    for n in range(heads):
        o_ref[0, n] = qkv_ref[0, 2 * heads + n]


def _noe_kernel(qkv_ref, o_ref, *, scale, heads):
    for n in range(heads):
        q = qkv_ref[0, n]
        k = qkv_ref[0, heads + n]
        v = qkv_ref[0, 2 * heads + n]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * 1.4426950408889634).astype(v.dtype)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, n] = (o / l).astype(o_ref.dtype)


def _call(kernel, qkv, extra=()):
    n3 = 3 * HEADS
    specs = [pl.BlockSpec((1, n3, SW, HD), lambda i: (i, 0, 0, 0))]
    args = [qkv]
    for arr in extra:
        nd = arr.ndim
        if nd == 4:
            specs.append(pl.BlockSpec((1,) + arr.shape[1:], lambda i: (i, 0, 0, 0)))
        else:
            specs.append(pl.BlockSpec(arr.shape, lambda i: tuple(0 for _ in arr.shape)))
        args.append(arr)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NW, HEADS, SW, HD), qkv.dtype),
        grid=(NW,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, HEADS, SW, HD), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)


def probe_copy():
    qkv, _ = _mk()
    k = functools.partial(_copy_kernel, heads=HEADS)

    def step(p, xx):
        return chain(xx, _call(k, xx))

    return timeit(step, {}, qkv)


def probe_noe():
    qkv, _ = _mk()
    k = functools.partial(_noe_kernel, scale=HD ** -0.5, heads=HEADS)

    def step(p, xx):
        return chain(xx, _call(k, xx))

    return timeit(step, {}, qkv)


def probe_relonly():
    qkv, rh = _mk()

    def step(p, xx):
        return chain(xx, rel_factors(xx[:, :HEADS], rh, rh, (WIN, WIN)))

    return timeit(step, {}, qkv)


def probe_fullprod():
    qkv, rh = _mk()

    def step(p, xx):
        return chain(xx, _fused_fwd(xx, rh, rh, (WIN, WIN)))

    return timeit(step, {}, qkv)




def _copy_dense_kernel(qkv_ref, o_ref, *, pairs):
    for n in range(pairs):
        o_ref[0, n] = qkv_ref[0, 2 * pairs + n]


def probe_copy_dense():
    """Lane-dense blocks: heads packed in pairs -> (nw, 18, 196, 128)."""
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, 3 * HEADS // 2, SW, 2 * HD), jnp.bfloat16) * 0.05
    k = functools.partial(_copy_dense_kernel, pairs=HEADS // 2)

    def step(p, xx):
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((NW, HEADS // 2, SW, 2 * HD), xx.dtype),
            grid=(NW,),
            in_specs=[pl.BlockSpec((1, 3 * HEADS // 2, SW, 2 * HD), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, HEADS // 2, SW, 2 * HD), lambda i: (i, 0, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xx)
        return chain(xx, out)

    return timeit(step, {}, qkv)


def probe_attn_dense():
    """Dense pair-packed blocks + in-kernel lane splits for the matmuls."""
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (NW, 3 * HEADS // 2, SW, 2 * HD), jnp.bfloat16) * 0.05

    def kern(qkv_ref, o_ref):
        pairs = HEADS // 2
        scale = HD ** -0.5
        for n in range(pairs):
            qp = qkv_ref[0, n]
            kp = qkv_ref[0, pairs + n]
            vp = qkv_ref[0, 2 * pairs + n]
            outs = []
            for half in range(2):
                sl = slice(half * HD, (half + 1) * HD)
                q, k2, v = qp[:, sl], kp[:, sl], vp[:, sl]
                s = jax.lax.dot_general(
                    q, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * scale
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2((s - m) * 1.4426950408889634).astype(v.dtype)
                l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
                o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
                outs.append((o / l).astype(o_ref.dtype))
            o_ref[0, n] = jnp.concatenate(outs, axis=-1)

    def step(p, xx):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((NW, HEADS // 2, SW, 2 * HD), xx.dtype),
            grid=(NW,),
            in_specs=[pl.BlockSpec((1, 3 * HEADS // 2, SW, 2 * HD), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, HEADS // 2, SW, 2 * HD), lambda i: (i, 0, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xx)
        return chain(xx, out)

    return timeit(step, {}, qkv)




def probe_rel_sliced():
    """rel factors via 14 major-dim-sliced matmuls instead of grouped einsum."""
    qkv, rh = _mk()

    def run(q):
        import jax.numpy as jnp
        b, n, s, d = q.shape
        h = w = WIN
        th = rh.astype(q.dtype)
        idx = jnp.arange(h)[:, None] + jnp.arange(h)[None, :]
        th_g = th[idx]  # (h, h, d) rows qr -> table slice
        qg = q.reshape(b * n, h, w, d)
        outs_h = [
            jnp.einsum("mwc,jc->mwj", qg[:, g], th_g[g]) for g in range(h)
        ]
        rel_h = jnp.stack(outs_h, axis=1)  # (bn, h, w, h)
        outs_w = [
            jnp.einsum("mhc,jc->mhj", qg[:, :, g], th_g[g]) for g in range(w)
        ]
        rel_w = jnp.stack(outs_w, axis=2)  # (bn, h, w, w)
        return jnp.concatenate([rel_h, rel_w], axis=-1).reshape(b, n, s, 2 * h)

    def step(p, xx):
        return chain(xx, run(xx[:, :HEADS]))

    return timeit(step, {}, qkv)


def probe_rel_pair():
    """Pair-packed grouped einsum: q (nw, 6, 196, 128), block-diag table."""
    qkv, rh = _mk()
    qp = qkv[:, :HEADS].reshape(NW, HEADS // 2, 2, SW, HD)
    qp = jnp.swapaxes(qp, 2, 3).reshape(NW, HEADS // 2, SW, 2 * HD)

    def run(q):
        b, np_, s, d2 = q.shape
        h = w = WIN
        th = rh.astype(q.dtype)
        idx = jnp.arange(h)[:, None] + jnp.arange(h)[None, :]
        tg = th[idx]  # (h, h, 64)
        z = jnp.zeros_like(tg)
        # block-diag (h, 2j, 2c): head a cols 0:64 -> j 0:h, head b -> j h:2h
        t2 = jnp.concatenate(
            [jnp.concatenate([tg, z], axis=-1), jnp.concatenate([z, tg], axis=-1)],
            axis=1,
        )  # (h, 2h, 128)
        qg = q.reshape(b * np_, h, w, d2)
        rel = jnp.einsum("bhwc,hjc->bhwj", qg, t2)  # (bnp, h, w, 2h)
        return rel.reshape(b, np_, s, 2 * h)

    def step(p, xx):
        return chain(xx, run(xx))

    return timeit(step, {}, qp)


PROBES = {k[6:]: v for k, v in list(globals().items()) if k.startswith("probe_")}


def main():
    names = sys.argv[1:] or ["copy", "noe", "relonly", "fullprod"]
    for name in names:
        dt = PROBES[name]()
        print(f"{name:10s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
