"""Component timing for the CURRENT fused encoder path (round 2).

Times the real SamVisionLayer modules (attn_impl="fused") in isolation:
  full         entire encoder forward @1024^2 bs8 bf16
  global4      4x global layer (fused LN+qkv kernel, fused attention, proj, fused MLP)
  window8      8x window layer (head-major qkv, window partition, fused attention)
  patch_neck   patchify + neck
Chained-dependency timing (see scripts/perf_probe.py docstring).

Usage: python scripts/perf_probe2.py [component ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("RSPROMPTER_PROBE_BS", "8"))
IMG = 1024
GRID = 64
C = 768


def timeit(step, params, x0, n_lo=4, n_hi=14):
    """In-graph scan slope (bench.py methodology): per-call tunnel dispatch is
    ~100s of ms on axon, so host-timed loops are useless — time scan(n_hi)
    minus scan(n_lo) inside single programs instead. ``params`` must be a jit
    ARGUMENT (closing over them bakes them into the serialized HLO -> the
    remote-compile request body blows past the tunnel's length limit)."""

    def make(n):
        @jax.jit
        def prog(params, xx):
            def body(c, _):
                return step(params, c), ()

            out, _ = jax.lax.scan(body, xx, None, length=n)
            return jax.tree_util.tree_leaves(out)[0].mean()

        return prog

    lo, hi = make(n_lo), make(n_hi)
    for _ in range(3):
        float(np.asarray(lo(params, x0)))
        float(np.asarray(hi(params, x0)))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(lo(params, x0)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(hi(params, x0)))
        t_hi = time.perf_counter() - t0
        dts.append((t_hi - t_lo) / (n_hi - n_lo))
    return min(dts)


def chain(x, out):
    return x * (1.0 + (out.mean() * 1e-9).astype(x.dtype))


def _cfg():
    from rsprompter_tpu.models.sam.configs import sam_config

    return sam_config("base", image_size=IMG).vision_config


def probe_full():
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder

    model = SamVisionEncoder(config=_cfg(), attn_impl="fused", dtype=jnp.bfloat16)
    x = jnp.zeros((B, IMG, IMG, 3), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, output_hidden_states=False)
    )()

    @jax.jit
    def step(params, xx):
        return chain(xx, model.apply(params, xx, output_hidden_states=False))

    return timeit(step, params, x)


def _probe_layers(window: int, n_layers: int):
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionLayer

    cfg = _cfg()
    model = SamVisionLayer(
        config=cfg, window_size=window, attn_impl="fused", dtype=jnp.bfloat16
    )
    x = jnp.zeros((B, GRID, GRID, C), jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def step(params, xx):
        out = xx
        for _ in range(n_layers):
            out = model.apply(params, out)
        return chain(xx, out)

    return timeit(step, params, x)


def probe_global4():
    return _probe_layers(0, 4)


def probe_window8():
    return _probe_layers(14, 8)


def probe_patch_neck():
    import flax.linen as nn

    from rsprompter_tpu.models.sam.vision_encoder import (
        SamPatchEmbeddings,
        SamVisionNeck,
    )

    class PN(nn.Module):
        @nn.compact
        def __call__(self, img):
            x = SamPatchEmbeddings(hidden_size=C, dtype=jnp.bfloat16, name="pe")(img)
            return SamVisionNeck(output_channels=256, dtype=jnp.bfloat16, name="neck")(x)

    model = PN()
    img = jnp.zeros((B, IMG, IMG, 3), jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), img))()

    @jax.jit
    def step(params, xx):
        return chain(xx, model.apply(params, xx))

    return timeit(step, params, img)


PROBES = {
    "full": probe_full,
    "global4": probe_global4,
    "window8": probe_window8,
    "patch_neck": probe_patch_neck,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    results = {}
    for name in names:
        dt = PROBES[name]()
        results[name] = dt * 1e3
        print(f"{name:12s} {dt * 1e3:8.2f} ms/fwd bs{B}  ({B / dt:6.1f} img/s)", flush=True)
    if all(k in results for k in ("global4", "window8", "patch_neck")):
        acc = sum(results[k] for k in ("global4", "window8", "patch_neck"))
        print(f"{'sum-of-parts':12s} {acc:8.2f} ms  (full = {results.get('full', float('nan')):.2f})")


if __name__ == "__main__":
    main()
