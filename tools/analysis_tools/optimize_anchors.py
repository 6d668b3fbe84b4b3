"""Optimize RPN anchor shapes against a dataset's GT box statistics.

Behavior parity with the reference ``tools/analysis_tools/optimize_anchors.py``
(k-means over GT (w, h) with an IoU objective, YOLO-style), re-targeted at
this config system: boxes are collected from the train dataset, rescaled by
the test-pipeline keep-ratio geometry into the model's input frame, and
clustered to ``k`` anchors. Prints the anchors sorted by area plus the mean
best-IoU coverage (the number to compare against the current anchor set).

Usage:
  python tools/analysis_tools/optimize_anchors.py CONFIG \
      [--k 9] [--iters 100] [--max-images 500]
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
    p = argparse.ArgumentParser(description="k-means anchor optimization")
    p.add_argument("config")
    p.add_argument("--k", type=int, default=9, help="number of anchors")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--max-images", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def wh_iou(wh: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """Centered-box IoU (N, K): boxes and anchors share a common center, so
    IoU reduces to min-overlap over areas (the YOLO k-means distance)."""
    inter = np.minimum(wh[:, None, 0], anchors[None, :, 0]) * np.minimum(
        wh[:, None, 1], anchors[None, :, 1]
    )
    union = (
        wh[:, 0] * wh[:, 1]
    )[:, None] + (anchors[:, 0] * anchors[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def kmeans_anchors(wh: np.ndarray, k: int, iters: int = 100, seed: int = 0):
    """IoU-distance k-means (assignment by max IoU, update by median, the
    reference's YOLOKMeansAnchorOptimizer rule). Returns (anchors (k, 2)
    sorted by area, mean best-IoU)."""
    rs = np.random.RandomState(seed)
    anchors = wh[rs.choice(len(wh), k, replace=len(wh) < k)].astype(np.float64)
    assign = np.full(len(wh), -1)
    for _ in range(iters):
        ious = wh_iou(wh, anchors)
        new_assign = ious.argmax(1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for c in range(k):
            sel = wh[assign == c]
            if len(sel):
                anchors[c] = np.median(sel, axis=0)
    mean_iou = float(wh_iou(wh, anchors).max(1).mean())
    order = np.argsort(anchors[:, 0] * anchors[:, 1])
    return anchors[order], mean_iou


def collect_wh(cfg, max_images: int) -> np.ndarray:
    """GT (w, h) in model-input coordinates (keep-ratio resize into crop)."""
    from rsprompter_tpu.core.registry import DATASETS
    from rsprompter_tpu.data import coco as _coco  # noqa: F401 (registers)

    crop = tuple(cfg.get("crop_size", (1024, 1024)))
    ds = DATASETS.build(dict(cfg.train_dataloader["dataset"]))
    whs = []
    for i in range(min(len(ds), max_images)):
        info = ds.data_list[i]
        # annotation wh without decoding the image: scale from the stored
        # image size the same way the test pipeline does
        ih, iw = info.get("height"), info.get("width")
        boxes = np.asarray(
            [a["bbox"] for a in info["anns"] if not a.get("iscrowd", 0)],
            np.float64,
        ).reshape(-1, 4)  # xywh
        if ih is None or not len(boxes):
            continue
        scale = min(crop[0] / ih, crop[1] / iw)
        whs.append(boxes[:, 2:] * scale)
    if not whs:
        raise SystemExit("no GT boxes found (dataset empty or missing sizes)")
    wh = np.concatenate(whs)
    return wh[(wh > 1).all(1)]


def main():
    args = parse_args()
    from rsprompter_tpu.core.config import Config

    cfg = Config.fromfile(args.config)
    wh = collect_wh(cfg, args.max_images)
    anchors, mean_iou = kmeans_anchors(wh, args.k, args.iters, args.seed)
    print(f"{len(wh)} GT boxes, k={args.k}")
    print("anchors (w, h) sorted by area:")
    for w, h in anchors:
        print(f"  ({w:.1f}, {h:.1f})")
    print(f"mean best-IoU coverage: {mean_iou:.4f}")


if __name__ == "__main__":
    main()
