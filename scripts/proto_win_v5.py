"""Window-attention v5 prototype: fold the rel-pos bias expansion INTO the
score matmul.

Current per pair-half: sc = q@k^T (K=64) + f@E (K=56) — two small dots plus a
VPU add, 36 tiny MXU ops per window cell at ~2.5% utilization.
v5: sc = [q*scale | f_half(28)] @ [k | Ehw(28)]^T — ONE K=92 dot (24 ops/cell,
each denser), no bias add pass.

Variants:
  v5a: concat inside the kernel
  v5b: qhat pre-concatenated at trace time (factors emitted next to q lanes)

Run: python scripts/proto_win_v5.py [check|time]
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
    _expansion_matrix,
    _pair_fwd,
    rel_factors_pair,
)

WIN = 14
S = WIN * WIN
NW = 200  # 8 imgs x 25 windows
NP = 6
D = 64
LOG2E = 1.4426950408889634


def _kernel_v5a(qkv_ref, f_ref, ehw_ref, o_ref, *, scale, pairs, d, l):
    ehw = ehw_ref[...]  # (S, 2l)
    for n in range(pairs):
        qp = qkv_ref[0, n]
        kp = qkv_ref[0, pairs + n]
        vp = qkv_ref[0, 2 * pairs + n]
        f = f_ref[0, n]  # (S, 4l)
        outs = []
        for half in range(2):
            sl = slice(half * d, (half + 1) * d)
            qhat = jnp.concatenate(
                [qp[:, sl] * scale, f[:, half * 2 * l : (half + 1) * 2 * l]],
                axis=-1,
            )
            khat = jnp.concatenate([kp[:, sl], ehw], axis=-1)
            sc = jax.lax.dot_general(
                qhat, khat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2((sc - m) * LOG2E).astype(vp.dtype)
            norm = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            o = jax.lax.dot(p, vp[:, sl], preferred_element_type=jnp.float32)
            outs.append((o / norm).astype(o_ref.dtype))
        o_ref[0, n] = jnp.concatenate(outs, axis=-1)


def fwd_v5a(qkv_pair, rel_pos_h, rel_pos_w, hw):
    h, w = hw
    b, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    d = d2 // 2
    l = max(h, w)
    scale = d ** -0.5
    f = rel_factors_pair(qkv_pair[:, :np_], rel_pos_h, rel_pos_w, hw)
    ehw = _expansion_matrix(hw, qkv_pair.dtype).T  # (S, 2l), flipped one-hots
    kernel = functools.partial(_kernel_v5a, scale=scale, pairs=np_, d=d, l=l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, s, d2), qkv_pair.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n3p, s, d2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, np_, s, 4 * l), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((s, 2 * l), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, np_, s, d2), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv_pair, f, ehw)


def _kernel_v5b(qf_ref, qkv_ref, khat_ref, o_ref, *, pairs, d, l):
    """qf: (1, np, S, 2*(d+2l)) pre-concat [qhat_a | qhat_b];
    khat: (1, np, S, 2*(d+2l)) pre-concat [khat_a | khat_b]."""
    dk = d + 2 * l
    for n in range(pairs):
        qf = qf_ref[0, n]
        kh = khat_ref[0, n]
        vp = qkv_ref[0, 2 * pairs + n]
        outs = []
        for half in range(2):
            sl = slice(half * dk, (half + 1) * dk)
            sc = jax.lax.dot_general(
                qf[:, sl], kh[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.exp2((sc - m) * LOG2E).astype(vp.dtype)
            norm = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            vsl = slice(half * d, (half + 1) * d)
            o = jax.lax.dot(p, vp[:, vsl], preferred_element_type=jnp.float32)
            outs.append((o / norm).astype(o_ref.dtype))
        o_ref[0, n] = jnp.concatenate(outs, axis=-1)


def fwd_v5b(qkv_pair, rel_pos_h, rel_pos_w, hw):
    h, w = hw
    b, n3p, s, d2 = qkv_pair.shape
    np_ = n3p // 3
    d = d2 // 2
    l = max(h, w)
    scale = jnp.asarray(d ** -0.5, qkv_pair.dtype)
    f = rel_factors_pair(qkv_pair[:, :np_], rel_pos_h, rel_pos_w, hw)
    ehw = _expansion_matrix(hw, qkv_pair.dtype).T  # (S, 2l)
    q = qkv_pair[:, :np_] * scale
    k = qkv_pair[:, np_ : 2 * np_]
    # [q_a | f_a | q_b | f_b] and [k_a | Ehw | k_b | Ehw]
    qf = jnp.concatenate(
        [q[..., :d], f[..., : 2 * l], q[..., d:], f[..., 2 * l :]], axis=-1
    )
    e_b = jnp.broadcast_to(ehw[None, None], (b, np_, s, 2 * l))
    khat = jnp.concatenate([k[..., :d], e_b, k[..., d:], e_b], axis=-1)
    dk = d + 2 * l
    kernel = functools.partial(_kernel_v5b, pairs=np_, d=d, l=l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, s, d2), qkv_pair.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, s, 2 * dk), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n3p, s, d2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, np_, s, 2 * dk), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, np_, s, d2), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qf, qkv_pair, khat)


def check():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (4, 3 * NP, S, 2 * D), jnp.bfloat16) * 0.3
    th = jax.random.normal(jax.random.PRNGKey(1), (2 * WIN - 1, D), jnp.bfloat16) * 0.2
    tw = jax.random.normal(jax.random.PRNGKey(2), (2 * WIN - 1, D), jnp.bfloat16) * 0.2
    ref = _pair_fwd(qkv, th, tw, (WIN, WIN))
    for name, fn in (("v5a", fwd_v5a), ("v5b", fwd_v5b)):
        new = fn(qkv, th, tw, (WIN, WIN))
        err = jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)))
        print(f"max |ref - {name}| =", float(err), flush=True)


def time_all():
    qkv = jnp.zeros((NW, 3 * NP, S, 2 * D), jnp.bfloat16)
    th = jnp.zeros((2 * WIN - 1, D), jnp.bfloat16)
    tw = jnp.zeros((2 * WIN - 1, D), jnp.bfloat16)

    def mk(fn):
        def step(p, xx):
            return chain(xx, fn(xx, th, tw, (WIN, WIN)))

        return step

    for name, fn in (("current", _pair_fwd), ("v5a", fwd_v5a), ("v5b", fwd_v5b)):
        dt = timeit(mk(fn), {}, qkv)
        print(f"{name:8s} {dt * 1e3:8.3f} ms/layer-attn", flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["check", "time"]:
        {"check": check, "time": time_all}[arg]()
