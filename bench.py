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
    # Pallas flash attention for the 4 global layers on TPU; XLA elsewhere
    attn_impl = "xla" if platform == "cpu" else "flash"
    model = SamVisionEncoder(config=cfg, attn_impl=attn_impl, dtype=jnp.bfloat16)

    x = jnp.zeros((batch, image_size, image_size, 3), jnp.bfloat16)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, output_hidden_states=False)
    )()

    @jax.jit
    def forward(params, x):
        return model.apply(params, x, output_hidden_states=False)

    # warmup / compile (force completion with a host transfer — on the axon
    # remote platform block_until_ready returns before execution finishes)
    import numpy as np

    out = forward(params, x)
    _ = np.asarray(out[0, 0, 0, :1])

    # chained timing: each forward consumes a value derived from the previous
    # output (non-foldable dependency), serializing execution; one tiny
    # transfer at the end. A warm chain first — the remote executor's first
    # few launches of a program are slower.
    def chain(xx, out):
        return x * (1.0 + (out.mean() * 1e-9).astype(x.dtype))

    xx = x
    for _ in range(6):
        xx = chain(xx, forward(params, xx))
    _ = np.asarray(xx[0, 0, 0])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        xx = chain(xx, forward(params, xx))
    _ = np.asarray(xx[0, 0, 0])
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
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
