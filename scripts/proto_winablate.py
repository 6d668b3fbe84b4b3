"""In-context ablation of the window layer: monkeypatch one component to a
shape-preserving near-no-op and time 8 layers, to get MARGINAL in-context
costs (isolated microprobes disagree with in-context timing on this chip).

Usage: python scripts/proto_winablate.py [base|noattn|nomlp|noqkvattn|global]
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


def time8(window=14):
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionLayer

    model = SamVisionLayer(
        config=_cfg(), window_size=window, attn_impl="fused", dtype=jnp.bfloat16
    )
    x = jnp.zeros((B, GRID, GRID, C), jnp.bfloat16)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def step(params, xx):
        out = xx
        for _ in range(8):
            out = model.apply(params, out)
        return chain(xx, out)

    return timeit(step, params, x)


def main(which):
    import rsprompter_tpu.models.sam.vision_encoder as ve
    import rsprompter_tpu.ops.fused_vit_attention as fa
    import rsprompter_tpu.ops.fused_mlp as fm

    if which == "noattn":
        # attention kernel -> return the q pair slice (keeps qkv+proj+layout)
        def fake_pair(qkv_pair, th, tw, hw):
            np_ = qkv_pair.shape[1] // 3
            return qkv_pair[:, :np_]

        ve.fused_qkv_attention_pair = fake_pair
    elif which == "nofac":
        # rel factors -> zeros (keeps the kernel, kills the factor einsums)
        fa.rel_factors_pair = lambda q, th, tw, hw: jnp.zeros(
            (q.shape[0], q.shape[1], q.shape[2], 4 * max(hw)), q.dtype
        )
    elif which == "nomlp":
        ve.fused_mlp_residual = lambda x, ls, lb, w1, b1, w2, b2, eps: x
    elif which == "noqkvattn":
        # whole attention sublayer -> identity (LN1 + partition remain)
        class FakeAttn(ve.SamVisionAttention):
            def __call__(self, x, ln_params=None):
                return x

        ve.SamVisionAttention = FakeAttn

    dt = time8()
    print(f"{which:12s} {dt * 1e3:8.2f} ms/8layers", flush=True)


if __name__ == "__main__":
    for which in sys.argv[1:] or ["base"]:
        main(which)
