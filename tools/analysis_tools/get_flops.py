#!/usr/bin/env python
"""Model FLOPs/memory analysis via XLA's compiled cost analysis.

Parity with the reference's ``tools/analysis_tools/get_flops.py`` — but exact
(compiler-reported), not a per-module estimate.

  python tools/analysis_tools/get_flops.py CONFIG [--batch 1] [--mode predict]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--mode", default="predict", choices=["predict", "loss"])
    args = p.parse_args()

    import jax

    from rsprompter_tpu.apis.build import build_detector
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.utils.testing import demo_batch

    cfg = Config.fromfile(args.config)
    crop = tuple(cfg.get("crop_size", (1024, 1024)))
    model = build_detector(cfg.model)
    batch = {
        k: jax.numpy.asarray(v)
        for k, v in demo_batch(args.batch, crop, max_gt=8).items()
    }
    if args.mode == "loss":
        variables = jax.eval_shape(
            lambda: model.init(
                {"params": jax.random.PRNGKey(0)}, batch,
                jax.random.PRNGKey(1), method="loss",
            )
        )
        def fn(v, b):
            return model.apply(v, b, jax.random.PRNGKey(1), method="loss",
                               mutable=["batch_stats"])
    else:
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, batch,
                               method="predict")
        )
        def fn(v, b):
            return model.apply(v, b, method="predict")

    lowered = jax.jit(fn).lower(variables, batch)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", 0)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables)
    )
    print(f"mode: {args.mode}  input: {args.batch}x{crop}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops: {flops / 1e9:.2f} GFLOPs")
    for k in ("bytes accessed", "transcendentals"):
        if k in cost:
            print(f"{k}: {cost[k] / 1e9:.2f} G")


if __name__ == "__main__":
    main()
