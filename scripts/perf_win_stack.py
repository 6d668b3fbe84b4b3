"""Prefix timing of the window-layer pipeline: where do the in-context ~3.4
ms of glue go? (perf_win_parts: parts sum 3.9 ms, real layer 7.2 ms.)

Times stage prefixes p1..p7 of the EXACT layer composition; per-stage cost =
successive differences (in-context, includes layout/fusion interactions the
isolated probes can't see). RANDOM data.

Usage: python scripts/perf_win_stack.py [upto ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perf_probe2 import timeit, chain, B, GRID, C  # noqa: E402
from rsprompter_tpu.models.sam.common import SamLayerNorm  # noqa: E402
from rsprompter_tpu.models.sam.vision_encoder import (  # noqa: E402
    window_partition,
    window_unpartition,
)
from rsprompter_tpu.ops.fused_mlp import fused_mlp_residual, fused_qkv_pair  # noqa: E402
from rsprompter_tpu.ops.fused_vit_attention import (  # noqa: E402
    fused_qkv_attention_pair,
)

WIN = 14
NP = 6
D = 64
NW = 25 * B
S = WIN * WIN


def _r(key, shape, scale=0.3, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype) * scale


def make_params():
    return dict(
        ls=_r(1, (C,), 1.0),
        lb=_r(2, (C,), 0.01),
        wk=_r(3, (C, 3 * C), 0.02),
        bk=_r(4, (3 * C,), 0.01),
        th=_r(5, (2 * WIN - 1, D), 0.2),
        tw=_r(6, (2 * WIN - 1, D), 0.2),
        wp=_r(7, (C, C), 0.02),
        bp=_r(8, (C,), 0.01),
        ls2=_r(9, (C,), 1.0),
        lb2=_r(10, (C,), 0.01),
        w1=_r(11, (C, 4 * C), 0.02),
        b1=_r(12, (4 * C,), 0.01),
        w2=_r(13, (4 * C, C), 0.02),
        b2=_r(14, (C,), 0.01),
    )


def run_upto(p, x, n):
    """Stages: 1 ln, 2 partition, 3 qkv, 4 attn, 5 proj, 6 unpartition+res,
    7 mlp."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["ls"] + p["lb"]
    if n == 1:
        return y
    w, padded = window_partition(y, WIN)
    w2 = w.reshape(NW, S, C)
    if n == 2:
        return w2
    qkv_p = fused_qkv_pair(w2.reshape(-1, C), p["wk"], p["bk"], 3 * 2 * NP, NW)
    if n == 3:
        return qkv_p
    out = fused_qkv_attention_pair(qkv_p, p["th"], p["tw"], (WIN, WIN))
    if n == 4:
        return out
    wn = p["wp"].reshape(NP, 2 * D, C)
    pr = jnp.einsum("bnsd,ndc->bsc", out, wn) + p["bp"]
    if n == 5:
        return pr
    up = window_unpartition(pr.reshape(NW, WIN, WIN, C), WIN, padded, (GRID, GRID))
    z = x + up
    if n == 6:
        return z
    return fused_mlp_residual(
        z.reshape(-1, C), p["ls2"], p["lb2"], p["w1"], p["b1"], p["w2"], p["b2"], 1e-6
    ).reshape(z.shape)


def main():
    params = make_params()
    x = _r(0, (B, GRID, GRID, C))
    names = [
        "ln", "partition", "qkv", "attn", "proj", "unpart+res", "mlp",
    ]
    upto = [int(a) for a in sys.argv[1:]] or list(range(1, 8))
    prev = 0.0
    for n in upto:
        dt = timeit(lambda p, xx: chain(xx, run_upto(p, xx, n)), params, x)
        print(
            f"p{n} ({names[n - 1]:10s}) {dt * 1e3:8.3f} ms  "
            f"(+{(dt - prev) * 1e3:6.3f})", flush=True,
        )
        prev = dt


if __name__ == "__main__":
    main()
