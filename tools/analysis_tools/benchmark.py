#!/usr/bin/env python
"""Inference / dataloader benchmark harness.

Behavior parity: reference ``mmdet/utils/benchmark.py:71,121,278`` +
``tools/analysis_tools/benchmark.py``: measure model fps (device-event timed),
dataloader throughput, or dataset decode throughput.

  python tools/analysis_tools/benchmark.py CONFIG --task inference|dataloader|dataset
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def bench_inference(cfg, repeat: int, batch_size: int):
    import jax

    from rsprompter_tpu.apis.build import build_detector
    from rsprompter_tpu.utils.testing import demo_batch

    crop = tuple(cfg.get("crop_size", (1024, 1024)))
    model = build_detector(cfg.model)
    batch = {
        k: jax.numpy.asarray(v)
        for k, v in demo_batch(batch_size, crop, max_gt=8).items()
    }
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, method="predict")
    )()
    predict = jax.jit(lambda v, b: model.apply(v, b, method="predict"))
    out = predict(variables, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = predict(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = batch_size * repeat / dt
    print(f"inference: {fps:.2f} img/s ({dt / repeat * 1000:.1f} ms/batch of {batch_size})")


def bench_dataloader(cfg, repeat: int):
    from rsprompter_tpu.core.registry import DATASETS
    from rsprompter_tpu.data import coco as _  # noqa: F401
    from rsprompter_tpu.data.loader import DataLoader
    from rsprompter_tpu.data.transforms import build_train_pipeline

    crop = tuple(cfg.get("crop_size", (1024, 1024)))
    ds_cfg = dict(cfg.train_dataloader["dataset"])
    ds_cfg["pipeline"] = build_train_pipeline(crop)
    ds = DATASETS.build(ds_cfg)
    loader = DataLoader(ds, batch_size=cfg.train_dataloader.get("batch_size", 2),
                        pad_shape=crop)
    n = 0
    t0 = time.perf_counter()
    for batch, metas in loader:
        n += len(metas)
        if n >= repeat:
            break
    dt = time.perf_counter() - t0
    print(f"dataloader: {n / dt:.2f} img/s")


def bench_dataset(cfg, repeat: int):
    from rsprompter_tpu.core.registry import DATASETS
    from rsprompter_tpu.data import coco as _  # noqa: F401

    ds_cfg = dict(cfg.train_dataloader["dataset"])
    ds_cfg["pipeline"] = []
    ds = DATASETS.build(ds_cfg)
    t0 = time.perf_counter()
    n = min(repeat, len(ds))
    for i in range(n):
        ds.load_raw(i)
    dt = time.perf_counter() - t0
    print(f"dataset decode: {n / dt:.2f} img/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--task", default="inference",
                   choices=["inference", "dataloader", "dataset"])
    p.add_argument("--repeat", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args()

    from rsprompter_tpu.core.config import Config

    cfg = Config.fromfile(args.config)
    if args.task == "inference":
        bench_inference(cfg, args.repeat, args.batch_size)
    elif args.task == "dataloader":
        bench_dataloader(cfg, args.repeat)
    else:
        bench_dataset(cfg, args.repeat)


if __name__ == "__main__":
    main()
