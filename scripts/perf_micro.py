"""Micro-probes inside one encoder layer (scan-slope timing, see perf_probe2).

Usage: python scripts/perf_micro.py [name ...]
"""

from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perf_probe2 import timeit, chain, B, GRID, C  # noqa: E402

HEADS = 12
HD = 64
WIN = 14
S_G = GRID * GRID


def probe_ln():
    """One SamLayerNorm over the (B,64,64,C) map."""
    from rsprompter_tpu.models.sam.common import SamLayerNorm

    m = SamLayerNorm()
    x = jnp.zeros((B, GRID, GRID, C), jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()

    def step(p, xx):
        return chain(xx, m.apply(p, xx))

    return timeit(step, p, x)


def probe_winpart():
    """window_partition + unpartition round trip (pure data movement)."""
    from rsprompter_tpu.models.sam.vision_encoder import (
        window_partition,
        window_unpartition,
    )

    x = jnp.zeros((B, GRID, GRID, C), jnp.bfloat16)

    def step(p, xx):
        w, padded = window_partition(xx, WIN)
        y = window_unpartition(w + 1.0, WIN, padded, (GRID, GRID))
        return chain(xx, y)

    return timeit(step, {}, x)


def probe_qkv_headmajor_win():
    """Head-major qkv dense on the windowed (200, 196, C) layout."""
    from rsprompter_tpu.models.sam.vision_encoder import _HeadMajorDense

    nw = B * 25
    m = _HeadMajorDense(heads=3 * HEADS, head_dim=HD, dtype=jnp.bfloat16)
    x = jnp.zeros((nw, WIN * WIN, C), jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()

    def step(p, xx):
        return chain(xx, m.apply(p, xx))

    return timeit(step, p, x)


def probe_attn_win():
    """fused_qkv_attention on the window shapes (200 windows, S=196)."""
    from rsprompter_tpu.ops.fused_vit_attention import fused_qkv_attention

    nw = B * 25
    qkv = jnp.zeros((nw, 3 * HEADS, WIN * WIN, HD), jnp.bfloat16)
    rh = jnp.zeros((2 * WIN - 1, HD), jnp.bfloat16)

    def step(p, xx):
        return chain(xx, fused_qkv_attention(xx, rh, rh, (WIN, WIN)))

    return timeit(step, {}, qkv)


def probe_proj_win():
    from rsprompter_tpu.models.sam.vision_encoder import _HeadMajorProj

    nw = B * 25
    m = _HeadMajorProj(features=C, dtype=jnp.bfloat16)
    x = jnp.zeros((nw, HEADS, WIN * WIN, HD), jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()

    def step(p, xx):
        return chain(xx, m.apply(p, xx))

    return timeit(step, p, x)


def probe_mlp():
    """fused LN2+MLP+residual on the full token set."""
    from rsprompter_tpu.ops.fused_mlp import fused_mlp_residual

    n = B * S_G
    x = jnp.zeros((n, C), jnp.bfloat16)
    ls = jnp.ones((C,), jnp.float32)
    lb = jnp.zeros((C,), jnp.float32)
    w1 = jnp.zeros((C, 4 * C), jnp.bfloat16)
    b1 = jnp.zeros((4 * C,), jnp.bfloat16)
    w2 = jnp.zeros((4 * C, C), jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.bfloat16)
    p = (ls, lb, w1, b1, w2, b2)

    def step(p, xx):
        ls, lb, w1, b1, w2, b2 = p
        return chain(xx, fused_mlp_residual(xx, ls, lb, w1, b1, w2, b2, 1e-6))

    return timeit(step, p, x)


def probe_lnqkv_global():
    """fused LN+qkv kernel on the global layout."""
    from rsprompter_tpu.ops.fused_mlp import fused_ln_qkv

    n = B * S_G
    x = jnp.zeros((n, C), jnp.bfloat16)
    ls = jnp.ones((C,), jnp.float32)
    lb = jnp.zeros((C,), jnp.float32)
    wk = jnp.zeros((C, 3 * C), jnp.bfloat16)
    bk = jnp.zeros((3 * C,), jnp.bfloat16)
    p = (ls, lb, wk, bk)

    def step(p, xx):
        ls, lb, wk, bk = p
        return chain(xx, fused_ln_qkv(xx, ls, lb, wk, bk, 1e-6, 3 * HEADS, B))

    return timeit(step, p, x)


def probe_attn_global():
    """fused_qkv_attention on the global shapes (B, 36, 4096, 64)."""
    from rsprompter_tpu.ops.fused_vit_attention import fused_qkv_attention

    qkv = jnp.zeros((B, 3 * HEADS, S_G, HD), jnp.bfloat16)
    rh = jnp.zeros((2 * GRID - 1, HD), jnp.bfloat16)

    def step(p, xx):
        return chain(xx, fused_qkv_attention(xx, rh, rh, (GRID, GRID)))

    return timeit(step, {}, qkv)


def probe_relfac_global():
    """rel_factors alone on the global shapes."""
    from rsprompter_tpu.ops.fused_vit_attention import rel_factors

    q = jnp.zeros((B, HEADS, S_G, HD), jnp.bfloat16)
    rh = jnp.zeros((2 * GRID - 1, HD), jnp.bfloat16)

    def step(p, xx):
        f = rel_factors(xx, rh, rh, (GRID, GRID))
        return chain(xx, f)

    return timeit(step, {}, q)


def probe_proj_global():
    from rsprompter_tpu.models.sam.vision_encoder import _HeadMajorProj

    m = _HeadMajorProj(features=C, dtype=jnp.bfloat16)
    x = jnp.zeros((B, HEADS, S_G, HD), jnp.bfloat16)
    p = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()

    def step(p, xx):
        return chain(xx, m.apply(p, xx))

    return timeit(step, p, x)


def probe_mlp_blocks():
    """fused_mlp_residual at different block sizes (hacks _fwd defaults)."""
    import rsprompter_tpu.ops.fused_mlp as fm

    n = B * S_G
    x = jnp.zeros((n, C), jnp.bfloat16)
    ls = jnp.ones((C,), jnp.float32)
    lb = jnp.zeros((C,), jnp.float32)
    w1 = jnp.zeros((C, 4 * C), jnp.bfloat16)
    b1 = jnp.zeros((4 * C,), jnp.bfloat16)
    w2 = jnp.zeros((4 * C, C), jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.bfloat16)
    p = (ls, lb, w1, b1, w2, b2)

    for block in (128, 256, 512, 1024):
        def step(p, xx, block=block):
            ls, lb, w1, b1, w2, b2 = p
            return chain(xx, fm._fwd(xx, ls, lb, w1, b1, w2, b2, 1e-6, block=block))

        dt = timeit(step, p, x)
        print(f"  mlp block={block:5d} {dt * 1e3:8.3f} ms", flush=True)
    return 0.0


def probe_lnqkv_blocks():
    import rsprompter_tpu.ops.fused_mlp as fm

    n = B * S_G
    x = jnp.zeros((n, C), jnp.bfloat16)
    ls = jnp.ones((C,), jnp.float32)
    lb = jnp.zeros((C,), jnp.float32)
    wk = jnp.zeros((C, 3 * C), jnp.bfloat16)
    bk = jnp.zeros((3 * C,), jnp.bfloat16)
    p = (ls, lb, wk, bk)

    for block in (256, 512, 1024, 2048):
        def step(p, xx, block=block):
            ls, lb, wk, bk = p
            return chain(xx, fm._ln_qkv_fwd(xx, ls, lb, wk, bk, 1e-6, 3 * HEADS, B, block=block))

        dt = timeit(step, p, x)
        print(f"  lnqkv block={block:5d} {dt * 1e3:8.3f} ms", flush=True)
    return 0.0


PROBES = {k[6:]: v for k, v in list(globals().items()) if k.startswith("probe_")}


def main():
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        dt = PROBES[name]()
        print(f"{name:20s} {dt * 1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
