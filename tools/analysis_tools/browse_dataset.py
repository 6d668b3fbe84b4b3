"""Render ground-truth annotations over dataset images (sanity-check data +
config before training).

Behavior parity with the reference ``tools/analysis_tools/browse_dataset.py``
(iterate the configured dataset, draw GT boxes/masks/labels, save to
``--output-dir``), minus the interactive imshow (headless environments).

By default draws the RAW annotations; ``--pipeline`` additionally runs the
train pipeline (flip/resize/crop) so you see exactly what the model sees.

Usage:
  python tools/analysis_tools/browse_dataset.py CONFIG \
      --output-dir /tmp/browse [--phase val] [--max-samples 20] [--pipeline]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def parse_args():
    p = argparse.ArgumentParser(description="visualize dataset ground truth")
    p.add_argument("config")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--phase", default="train", choices=("train", "val", "test"))
    p.add_argument("--max-samples", type=int, default=20)
    p.add_argument("--pipeline", action="store_true",
                   help="draw the train-pipeline output instead of raw GT")
    return p.parse_args()


def main():
    args = parse_args()
    import cv2

    from rsprompter_tpu.apis.inferencer import draw_predictions
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.core.registry import DATASETS
    from rsprompter_tpu.data import coco as _coco  # noqa: F401 (registers)
    from rsprompter_tpu.data.transforms import build_train_pipeline

    cfg = Config.fromfile(args.config)
    loader_key = f"{args.phase}_dataloader"
    ds_cfg = dict(cfg.get(loader_key, cfg.get("val_dataloader"))["dataset"])
    ds = DATASETS.build(ds_cfg)
    classes = ds.metainfo.get("classes")
    pipeline = (
        build_train_pipeline(tuple(cfg.get("crop_size", (1024, 1024))))
        if args.pipeline else None
    )

    os.makedirs(args.output_dir, exist_ok=True)
    n = min(len(ds), args.max_samples)
    for i in range(n):
        s = ds.load_raw(i)
        if pipeline is not None:
            for t in pipeline:
                s = t(s)
                if s is None:
                    break
            if s is None:  # filtered (e.g. no GT survived the crop)
                continue
        keep = ~s["gt_ignore_flags"]
        pred = dict(
            bboxes=s["gt_bboxes"][keep].tolist(),
            scores=[1.0] * int(keep.sum()),
            labels=s["gt_labels"][keep].tolist(),
            masks=s["gt_masks"][keep].astype(bool),
        )
        vis = draw_predictions(s["img"], pred, classes=classes)
        name = os.path.basename(s.get("img_path") or f"sample_{i}.jpg")
        cv2.imwrite(os.path.join(args.output_dir, name), vis)
        print(f"[{i + 1}/{n}] {name}: {int(keep.sum())} instances")


if __name__ == "__main__":
    main()
