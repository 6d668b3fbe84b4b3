"""On-chip component timing probe for the SAM ViT-B encoder @1024^2 bs8.

Times each encoder component in isolation with the chained-dependency trick
(the axon tunnel's async dispatch makes block_until_ready unreliable; a data
dependency through a scalar serializes iterations). Prints a ms/forward
breakdown so optimization effort follows measurement, not guesswork.

Usage: python scripts/perf_probe.py [component ...]
Components: full trunk flash_global win_attn patch_neck xla_global
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 8
IMG = 1024
GRID = 64  # token grid
C = 768
HEADS = 12
HEAD_DIM = 64
WINDOW = 14
N_LAYERS = 12
N_GLOBAL = 4
N_WIN = 8
MLP_DIM = 3072


def timeit(step, x0, warm=6, iters=10):
    """step: carrier -> carrier (jitted). Returns seconds per iteration."""
    xx = x0
    for _ in range(warm):
        xx = step(xx)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(xx)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        xx = step(xx)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(xx)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def chain(x, out):
    return x * (1.0 + (out.mean() * 1e-9).astype(x.dtype))


def probe_full():
    from rsprompter_tpu.models.sam.configs import sam_config
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder

    cfg = sam_config("base", image_size=IMG).vision_config
    model = SamVisionEncoder(config=cfg, attn_impl="flash", dtype=jnp.bfloat16)
    x = jnp.zeros((B, IMG, IMG, 3), jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, output_hidden_states=False))()

    @jax.jit
    def step(params, xx):
        out = model.apply(params, xx, output_hidden_states=False)
        return chain(xx, out)

    import functools
    return timeit(functools.partial(step, params), x)


def probe_trunk():
    """12 x (LN + qkv + proj + LN + MLP) with attention replaced by identity."""
    import flax.linen as nn
    from rsprompter_tpu.models.sam.common import MLPBlock, SamLayerNorm

    class Trunk(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(N_LAYERS):
                r = x
                y = SamLayerNorm(name=f"ln1_{i}")(x)
                qkv = nn.Dense(3 * C, dtype=jnp.bfloat16, name=f"qkv_{i}")(y)
                # identity "attention": take the v third
                y = qkv[..., 2 * C :]
                y = nn.Dense(C, dtype=jnp.bfloat16, name=f"proj_{i}")(y)
                x = r + y
                y = SamLayerNorm(name=f"ln2_{i}")(x)
                y = MLPBlock(mlp_dim=MLP_DIM, hidden_size=C, dtype=jnp.bfloat16, name=f"mlp_{i}")(y)
                x = x + y
            return x

    model = Trunk()
    x = jnp.zeros((B, GRID, GRID, C), jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def step(params, xx):
        return chain(xx, model.apply(params, xx))

    import functools
    return timeit(functools.partial(step, params), x)


def probe_flash_global(n_layers=N_GLOBAL):
    from rsprompter_tpu.ops.flash_attention import flash_attention_rel_pos

    s = GRID * GRID
    q = jnp.zeros((B, HEADS, s, HEAD_DIM), jnp.bfloat16)
    rel_h = jnp.zeros((2 * GRID - 1, HEAD_DIM), jnp.bfloat16)
    rel_w = jnp.zeros((2 * GRID - 1, HEAD_DIM), jnp.bfloat16)

    @jax.jit
    def step(qq):
        out = qq
        for _ in range(n_layers):
            out = flash_attention_rel_pos(out, qq, qq, (GRID, GRID), rel_h, rel_w)
        return chain(qq, out)

    return timeit(step, q)


def probe_win_attn(n_layers=N_WIN):
    """The full windowed path: partition -> qkv-shaped attention -> unpartition."""
    from rsprompter_tpu.models.sam.vision_encoder import (
        window_partition,
        window_unpartition,
    )
    from rsprompter_tpu.ops.attention import attention_rel_pos

    x = jnp.zeros((B, GRID, GRID, C), jnp.bfloat16)
    rel_h = jnp.zeros((2 * WINDOW - 1, HEAD_DIM), jnp.bfloat16)
    rel_w = jnp.zeros((2 * WINDOW - 1, HEAD_DIM), jnp.bfloat16)

    def one_layer(y):
        yw, padded = window_partition(y, WINDOW)
        bw = yw.shape[0]
        s = WINDOW * WINDOW
        qkv = yw.reshape(bw, s, C)
        q = qkv.reshape(bw, s, HEADS, HEAD_DIM).transpose(0, 2, 1, 3)
        out = attention_rel_pos(q, q, q, (WINDOW, WINDOW), rel_h, rel_w, impl="flash")
        out = out.transpose(0, 2, 1, 3).reshape(bw, WINDOW, WINDOW, C)
        return window_unpartition(out, WINDOW, padded, (GRID, GRID))

    @jax.jit
    def step(xx):
        out = xx
        for _ in range(n_layers):
            out = one_layer(out)
        return chain(xx, out)

    return timeit(step, x)


def probe_patch_neck():
    import flax.linen as nn
    from rsprompter_tpu.models.sam.vision_encoder import SamPatchEmbeddings, SamVisionNeck

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

    import functools
    return timeit(functools.partial(step, params), img)


PROBES = {
    "full": probe_full,
    "trunk": probe_trunk,
    "flash_global": probe_flash_global,
    "win_attn": probe_win_attn,
    "patch_neck": probe_patch_neck,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    results = {}
    for name in names:
        dt = PROBES[name]()
        results[name] = dt * 1e3
        print(f"{name:14s} {dt * 1e3:8.2f} ms/forward  ({B / dt:6.1f} img/s)", flush=True)
    if all(k in results for k in ("trunk", "flash_global", "win_attn", "patch_neck")):
        acc = sum(results[k] for k in ("trunk", "flash_global", "win_attn", "patch_neck"))
        print(f"{'sum-of-parts':14s} {acc:8.2f} ms  (full = {results.get('full', float('nan')):.2f})")


if __name__ == "__main__":
    main()
