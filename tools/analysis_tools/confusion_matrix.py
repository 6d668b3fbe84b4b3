#!/usr/bin/env python
"""Confusion matrix from detection results.

CLI parity with the reference's
``tools/analysis_tools/confusion_matrix.py``: evaluate a checkpoint (or a
dumped predictions JSON from the inferencer) against the test dataset and
write a (classes+1) x (classes+1) confusion matrix — the extra row/column is
background (missed GT / false positives). Assignment follows the reference:
per image, each prediction above ``score_thr`` matches the highest-IoU GT
over ``tp_iou_thr``; unmatched predictions count as background-column FPs,
unmatched GTs as background-row misses.

Usage:
  python tools/analysis_tools/confusion_matrix.py CONFIG [CKPT] \
      [--out-dir DIR] [--score-thr 0.3] [--tp-iou-thr 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Confusion matrix")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out-dir", default="./work_dirs/confusion")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--tp-iou-thr", type=float, default=0.5)
    p.add_argument("--cfg-options", nargs="+", default=None)
    return p.parse_args()


def bbox_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4), (M, 4) xyxy -> (N, M) IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def accumulate(
    confusion: np.ndarray,
    pred_boxes: np.ndarray, pred_labels: np.ndarray, pred_scores: np.ndarray,
    gt_boxes: np.ndarray, gt_labels: np.ndarray,
    score_thr: float, tp_iou_thr: float,
) -> None:
    """Update confusion (C+1, C+1) in place for one image (row=GT, col=pred)."""
    nc = confusion.shape[0] - 1
    keep = pred_scores >= score_thr
    pred_boxes, pred_labels = pred_boxes[keep], pred_labels[keep]
    ious = bbox_iou(gt_boxes, pred_boxes)  # (G, P)
    gt_hit = np.zeros(len(gt_boxes), bool)
    pred_hit = np.zeros(len(pred_boxes), bool)
    for gi in range(len(gt_boxes)):
        for pi in np.argsort(-ious[gi]):
            if ious[gi, pi] < tp_iou_thr:
                break
            confusion[gt_labels[gi], pred_labels[pi]] += 1
            gt_hit[gi] = True
            pred_hit[pi] = True
    for gi in np.flatnonzero(~gt_hit):
        confusion[gt_labels[gi], nc] += 1  # missed GT -> background column
    for pi in np.flatnonzero(~pred_hit):
        confusion[nc, pred_labels[pi]] += 1  # FP -> background row


def plot(confusion: np.ndarray, classes, out_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    norm = confusion / np.maximum(confusion.sum(axis=1, keepdims=True), 1)
    labels = list(classes) + ["background"]
    fig, ax = plt.subplots(figsize=(0.8 * len(labels) + 2,) * 2)
    im = ax.imshow(norm, cmap="plasma", vmin=0, vmax=1)
    ax.set_xticks(range(len(labels)), labels, rotation=45, ha="right")
    ax.set_yticks(range(len(labels)), labels)
    ax.set_xlabel("prediction")
    ax.set_ylabel("ground truth")
    for i in range(len(labels)):
        for j in range(len(labels)):
            ax.text(j, i, f"{norm[i, j]:.2f}", ha="center", va="center",
                    color="w" if norm[i, j] < 0.5 else "k", fontsize=7)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    print(f"wrote {out_path}")


def main():
    args = parse_args()
    import jax

    from rsprompter_tpu.apis.build import build_detector
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.core.registry import DATASETS
    from rsprompter_tpu.data import coco as _coco  # registers datasets
    from rsprompter_tpu.data.loader import DataLoader
    from rsprompter_tpu.data.transforms import build_test_pipeline

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    crop = tuple(cfg.get("crop_size", (1024, 1024)))
    model = build_detector(cfg.model)

    ds_cfg = dict((cfg.get("test_dataloader") or cfg.val_dataloader)["dataset"])
    ds_cfg["pipeline"] = build_test_pipeline(crop)
    dataset = DATASETS.build(ds_cfg)
    loader = DataLoader(
        dataset, batch_size=cfg.get("val_dataloader", {}).get("batch_size", 2),
        shuffle=False, drop_last=False, max_gt=cfg.get("max_gt", 100),
        pad_shape=crop,
    )

    batch_np, _ = next(iter(loader))
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, method="predict")
    )()
    if args.checkpoint:
        from rsprompter_tpu.engine.checkpoint import restore_checkpoint

        target = dict(params=variables["params"])
        restored = restore_checkpoint(args.checkpoint, target)
        variables = {**variables, "params": restored["params"]}

    predict = jax.jit(lambda v, b: model.apply(v, b, method="predict"))
    classes = dataset.metainfo.get("classes", ())
    nc = len(classes) or cfg.model.get("num_classes", 1)
    confusion = np.zeros((nc + 1, nc + 1), np.int64)
    id_to_idx = {d["img_id"]: i for i, d in enumerate(dataset.data_list)}
    for batch_np, metas in loader:
        batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
        dets, _ = predict(variables, batch)
        dets = jax.device_get(dets)
        for bi, meta in enumerate(metas):
            if meta.get("img_id", -1) == -1:
                continue
            raw = dataset.load_raw(id_to_idx[meta["img_id"]])
            ws, hs = meta["scale_factor"]
            valid = np.asarray(dets.valid[bi])
            accumulate(
                confusion,
                np.asarray(dets.boxes[bi])[valid] / np.array([ws, hs, ws, hs]),
                np.asarray(dets.labels[bi])[valid].astype(int),
                np.asarray(dets.scores[bi])[valid],
                np.asarray(raw["gt_bboxes"], np.float32).reshape(-1, 4),
                np.asarray(raw["gt_labels"], int).reshape(-1),
                args.score_thr, args.tp_iou_thr,
            )
    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "confusion_matrix.npy"), confusion)
    print(confusion)
    plot(confusion, classes, os.path.join(args.out_dir, "confusion_matrix.png"))


if __name__ == "__main__":
    main()
