"""Benchmark: SAM ViT-B image-encoder throughput @1024^2 (images/sec/chip).

The headline metric of BASELINE.json ("images/sec/chip (SAM ViT-B @1024^2)").
The reference publishes no throughput baseline; the north-star target is
>= 2x an A100's throughput per chip. We take 40 img/s as the A100 fp16
reference point for SAM ViT-B @1024^2 (consistent with public SAM benchmarks),
so ``vs_baseline`` = value / 80.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


A100_REFERENCE_IPS = 40.0
TARGET_MULTIPLIER = 2.0


def main():
    from rsprompter_tpu.models.sam.configs import sam_config
    from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder

    batch = 8
    image_size = 1024
    cfg = sam_config("base", image_size=image_size).vision_config
    platform = jax.devices()[0].platform
    # fused Pallas path (packed-qkv attention + fused MLP) on TPU
    attn_impl = "xla" if platform == "cpu" else "fused"
    model = SamVisionEncoder(config=cfg, attn_impl=attn_impl, dtype=jnp.bfloat16)

    x = jnp.zeros((batch, image_size, image_size, 3), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, output_hidden_states=False)
    )()

    @jax.jit
    def forward(params, x):
        return model.apply(params, x, output_hidden_states=False)

    # In-graph chained timing: a lax.scan of N forwards where each iteration
    # consumes a scalar derived from the previous output (non-foldable data
    # dependency -> strictly serialized on device), returning one scalar.
    # Slope between two N values cancels dispatch/transfer constants — the
    # axon tunnel's async dispatch makes per-call host timing unreliable.
    import numpy as np

    def make(n):
        @jax.jit
        def prog(params, x):
            def body(xx, _):
                out = forward(params, xx)
                return xx * (1.0 + (out.mean() * 1e-9).astype(xx.dtype)), ()

            xx, _ = jax.lax.scan(body, x, None, length=n)
            return xx.mean()

        return prog

    n_lo, n_hi = 4, 14
    lo, hi = make(n_lo), make(n_hi)
    for _ in range(3):  # compile + per-program warmup
        float(np.asarray(lo(params, x)))
        float(np.asarray(hi(params, x)))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(lo(params, x)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(hi(params, x)))
        t_hi = time.perf_counter() - t0
        dts.append((t_hi - t_lo) / (n_hi - n_lo))
    dt = min(dts)

    ips = batch / dt
    baseline = A100_REFERENCE_IPS * TARGET_MULTIPLIER
    print(
        json.dumps(
            {
                "metric": f"images/sec/chip (SAM ViT-B @{image_size}^2, bs{batch}, bf16, {platform})",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
