"""Window-LAYER component breakdown @bs8 64x64 grid (random data).

The attention kernel itself is ~1.9 ms (proto_win_v8) but the layer budget
says ~6.9 ms/layer — where do the other ~5 ms go? Times each stage of
SamVisionLayer(window=14) in isolation with the scan-slope harness:

  ln1         SamLayerNorm on (8, 64, 64, 768)
  partition   window_partition pad+transpose (and inverse)
  qkv         fused_qkv_pair on the 200-window batch
  attn        _pair_fwd window kernel
  proj        _HeadMajorProj back to 768
  mlp         fused LN+MLP+residual on (8*4096, 768)
  layer       the full SamVisionLayer for reference

Usage: python scripts/perf_win_parts.py [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perf_probe2 import timeit, chain, B, GRID, C  # noqa: E402

WIN = 14
NP = 6
D = 64
NW = 25 * B
S = WIN * WIN


def _r(key, shape, scale=0.3):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.bfloat16) * scale


def probe_ln1():
    from rsprompter_tpu.models.sam.common import SamLayerNorm

    m = SamLayerNorm()
    x = _r(0, (B, GRID, GRID, C))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    return timeit(lambda p, xx: chain(xx, m.apply(p, xx)), params, x)


def probe_partition():
    from rsprompter_tpu.models.sam.vision_encoder import (
        window_partition,
        window_unpartition,
    )

    x = _r(0, (B, GRID, GRID, C))

    def step(p, xx):
        w, padded = window_partition(xx, WIN)
        y = window_unpartition(w, WIN, padded, (GRID, GRID))
        return chain(xx, y)

    return timeit(step, {}, x)


def probe_qkv():
    from rsprompter_tpu.ops.fused_mlp import fused_qkv_pair

    x = _r(0, (NW * S, C))
    wk = _r(1, (C, 3 * C), 0.02)
    bk = _r(2, (3 * C,), 0.02)

    def step(p, xx):
        out = fused_qkv_pair(xx, wk, bk, 3 * 2 * NP, NW)
        return chain(xx, out)

    return timeit(step, {}, x)


def probe_attn():
    from rsprompter_tpu.ops.fused_vit_attention import _pair_fwd

    qkv = _r(0, (NW, 3 * NP, S, 2 * D))
    th = _r(1, (2 * WIN - 1, D), 0.2)
    tw = _r(2, (2 * WIN - 1, D), 0.2)
    return timeit(lambda p, xx: chain(xx, _pair_fwd(xx, th, tw, (WIN, WIN))), {}, qkv)


def probe_proj():
    from rsprompter_tpu.models.sam.vision_encoder import _HeadMajorProj

    m = _HeadMajorProj(features=C, dtype=jnp.bfloat16)
    # pair-packed output of the attention: (NW, NP, S, 2D) -> unpack to heads
    x = _r(0, (NW, 2 * NP, S, D))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    return timeit(lambda p, xx: chain(xx, m.apply(p, xx)), params, x)


def probe_mlp():
    from rsprompter_tpu.ops.fused_mlp import fused_mlp_residual

    x = _r(0, (B * GRID * GRID, C))
    ls = _r(1, (C,), 1.0)
    lb = _r(2, (C,), 0.01)
    w1 = _r(3, (C, 4 * C), 0.02)
    b1 = _r(4, (4 * C,), 0.01)
    w2 = _r(5, (4 * C, C), 0.02)
    b2 = _r(6, (C,), 0.01)

    def step(p, xx):
        return chain(xx, fused_mlp_residual(xx, ls, lb, w1, b1, w2, b2, 1e-6))

    return timeit(step, {}, x)


def probe_layer():
    from rsprompter_tpu.models.sam.configs import sam_config
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionLayer

    cfg = sam_config("base", image_size=1024).vision_config
    m = SamVisionLayer(
        config=cfg, window_size=WIN, attn_impl="fused", dtype=jnp.bfloat16
    )
    x = _r(0, (B, GRID, GRID, C))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    return timeit(lambda p, xx: chain(xx, m.apply(p, xx)), params, x)


PROBES = {
    "ln1": probe_ln1,
    "partition": probe_partition,
    "qkv": probe_qkv,
    "attn": probe_attn,
    "proj": probe_proj,
    "mlp": probe_mlp,
    "layer": probe_layer,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    total = 0.0
    for name in names:
        dt = PROBES[name]()
        if name != "layer":
            total += dt
        print(f"{name:10s} {dt * 1e3:8.3f} ms", flush=True)
    if not sys.argv[1:]:
        print(f"{'sum-parts':10s} {total * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
