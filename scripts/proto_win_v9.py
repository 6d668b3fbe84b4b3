"""Window qkv v9: the PARTITION TRANSPOSE becomes the qkv kernel's BlockSpec.

perf_win_stack finding: qkv costs 1.37 ms in-context vs 0.31 isolated — the
(B,70,70,C) -> (200,196,C) partition transpose must materialize in HBM
because its consumer (the pallas qkv kernel) is opaque to XLA fusion. v9
reads the padded grid DIRECTLY with a (1,14,14,C) window block per cell
(grid B x 5 x 5) — the transpose becomes DMA addressing, nothing
materializes. Output is the same pair-packed (B*nW, 3np, S, 128) the
attention kernel already consumes.

check: parity vs ln->partition->fused_qkv_pair.
time:  in-context prefix (ln/pad -> qkv -> attn) for current vs v9.

Run: python scripts/proto_win_v9.py [check|time]
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

from perf_probe2 import timeit, chain, B, GRID, C  # noqa: E402
from rsprompter_tpu.ops.fused_mlp import fused_qkv_pair  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    fused_qkv_attention_pair,
)
from rsprompter_tpu.models.sam.vision_encoder import window_partition  # noqa: E402

WIN = 14
NP = 6
D = 64
S = WIN * WIN
HP = 70  # padded grid


def _strip_qkv_kernel(x_ref, w_ref, bias_ref, o_ref, *, pairs3, nwin):
    x = x_ref[0]  # (WIN, WP, C) row strip = nwin windows side by side
    w = w_ref[...]
    bias = bias_ref[...]
    for wi in range(nwin):
        xt = x[:, wi * WIN : (wi + 1) * WIN, :].reshape(S, x.shape[-1])
        y = jax.lax.dot(xt, w, preferred_element_type=jnp.float32)
        y = y.astype(x.dtype) + bias
        for j in range(pairs3):
            o_ref[wi, j] = y[:, j * 128 : (j + 1) * 128]


def fused_qkv_window_grid(x_grid, w, b, heads3):
    """x_grid (B, HP, WP, C) LN'd + zero-padded grid -> pair-packed qkv
    (B*nW, heads3//2, WIN^2, 128); window partition = BlockSpec DMA + cheap
    in-VMEM slices (one row-strip of nwin windows per grid cell)."""
    b_, hp, wp, c = x_grid.shape
    nh, nw = hp // WIN, wp // WIN
    pairs3 = heads3 // 2
    kernel = functools.partial(_strip_qkv_kernel, pairs3=pairs3, nwin=nw)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_ * nh * nw, pairs3, S, 128), x_grid.dtype),
        grid=(b_, nh),
        in_specs=[
            pl.BlockSpec((1, WIN, wp, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((c, heads3 * 64), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, heads3 * 64), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (nw, pairs3, S, 128),
            lambda bi, i, nh=nh: (bi * nh + i, 0, 0, 0),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.devices()[0].platform == "cpu",
    )(x_grid, w, b[None, :])


def _pad_grid(x):
    return jnp.pad(x, ((0, 0), (0, HP - GRID), (0, HP - GRID), (0, 0)))


def check():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, GRID, GRID, C), jnp.bfloat16) * 0.3
    w = jax.random.normal(jax.random.PRNGKey(1), (C, 3 * C), jnp.bfloat16) * 0.02
    b = jax.random.normal(jax.random.PRNGKey(2), (3 * C,), jnp.bfloat16) * 0.01

    wdw, _ = window_partition(x, WIN)
    nW = wdw.shape[0]
    ref = fused_qkv_pair(wdw.reshape(nW * S, C), w, b, 3 * 2 * NP, nW)
    new = fused_qkv_window_grid(_pad_grid(x), w, b, 3 * 2 * NP)
    err = jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32)))
    print("max |ref - v9| =", float(err), flush=True)


def _mk(key, shape, scale=0.3):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.bfloat16) * scale


def time_all():
    params = dict(
        ls=_mk(1, (C,), 1.0), lb=_mk(2, (C,), 0.01),
        wk=_mk(3, (C, 3 * C), 0.02), bk=_mk(4, (3 * C,), 0.01),
        th=_mk(5, (2 * WIN - 1, D), 0.2), tw=_mk(6, (2 * WIN - 1, D), 0.2),
    )
    x = _mk(0, (B, GRID, GRID, C))

    def ln(p, xx):
        mu = xx.mean(-1, keepdims=True)
        var = ((xx - mu) ** 2).mean(-1, keepdims=True)
        return (xx - mu) * jax.lax.rsqrt(var + 1e-6) * p["ls"] + p["lb"]

    def cur(p, xx):
        y = ln(p, xx)
        w, _ = window_partition(y, WIN)
        nW = w.shape[0]
        qkv_p = fused_qkv_pair(w.reshape(nW * S, C), p["wk"], p["bk"], 3 * 2 * NP, nW)
        out = fused_qkv_attention_pair(qkv_p, p["th"], p["tw"], (WIN, WIN))
        return chain(xx, out)

    def v9(p, xx):
        y = _pad_grid(ln(p, xx))
        qkv_p = fused_qkv_window_grid(y, p["wk"], p["bk"], 3 * 2 * NP)
        out = fused_qkv_attention_pair(qkv_p, p["th"], p["tw"], (WIN, WIN))
        return chain(xx, out)

    dt = timeit(cur, params, x)
    print(f"current ln+part+qkv+attn {dt * 1e3:8.3f} ms", flush=True)
    dt = timeit(v9, params, x)
    print(f"v9      ln+pad+qkv+attn  {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["check", "time"]:
        {"check": check, "time": time_all}[arg]()
