"""A/B: 8 window layers on the normal (B,64,64,C) stream (partition/unpartition
each layer) vs on a WINDOW-RESIDENT (200,14,14,C) stream (partition is a no-op;
MLP/LN run on the 20% padded token count).

If the resident variant wins big, restructure the encoder to keep runs of
window layers in windowed layout (pad/partition once per run).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perf_probe2 import timeit, chain, B, GRID, C  # noqa: E402


def _cfg():
    from rsprompter_tpu.models.sam.configs import sam_config

    return sam_config("base", image_size=1024).vision_config


def run(shape_name: str, x_shape):
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionLayer

    model = SamVisionLayer(
        config=_cfg(), window_size=14, attn_impl="fused", dtype=jnp.bfloat16
    )
    x = jnp.zeros(x_shape, jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def step(params, xx):
        out = xx
        for _ in range(8):
            out = model.apply(params, out)
        return chain(xx, out)

    dt = timeit(step, params, x)
    print(f"{shape_name:24s} {dt * 1e3:8.2f} ms/8layers", flush=True)


if __name__ == "__main__":
    run("stream (8,64,64,C)", (B, GRID, GRID, C))
    run("resident (200,14,14,C)", (200, 14, 14, C))
