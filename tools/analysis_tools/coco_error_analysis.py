"""Decompose detection errors into the COCO-analyze waterfall.

Behavior parity with the reference ``tools/analysis_tools/coco_error_analysis.py``
(derived from the official coco-analyze recipe): per class, AP is re-measured
while progressively forgiving one error type —

  C75  AP at IoU .75
  C50  AP at IoU .50
  Loc  AP at IoU .10            (localization errors forgiven)
  Oth  AP at IoU .10, every GT relabeled to the class
                                (class confusion forgiven; the flat label
                                 spaces here have no supercategories, so the
                                 reference's Sim step collapses into Oth)
  BG   max recall of the Oth run (background false positives forgiven:
                                 precision pinned to 1 up to max recall)
  FN   1.0                      (missed detections forgiven)

Each successive gap shows how much AP that error type costs. Driven by the
self-contained JSON dump from ``tools/test.py --out``.

Usage:
  python tools/analysis_tools/coco_error_analysis.py results.json \
      [--metric bbox|segm] [--out curves.png]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

STAGES = ("C75", "C50", "Loc", "Oth", "BG", "FN")


def parse_args():
    p = argparse.ArgumentParser(description="COCO error-type analysis")
    p.add_argument("results", help="JSON dump from tools/test.py --out")
    p.add_argument("--metric", default="bbox", choices=("bbox", "segm"))
    p.add_argument("--out", default=None, help="optional stacked-bar PNG")
    return p.parse_args()


def analyze_dump(path: str, metric: str = "bbox") -> dict:
    """-> {class_idx: {C75, C50, Loc, Oth, BG, FN}} (NaN-free classes only)."""
    from rsprompter_tpu.evaluation.coco_eval import CocoEvaluator
    from rsprompter_tpu.evaluation.coco_metric import from_jsonable

    with open(path) as f:
        dump = json.load(f)
    if metric not in dump["metrics"]:
        raise ValueError(f"{metric} not in dump (has {dump['metrics']})")
    nc = dump["num_classes"]
    images = [
        (from_jsonable(r["det"]), from_jsonable(r["gt"])) for r in dump["images"]
    ]

    std = CocoEvaluator(nc, iou_type=metric)
    loc = CocoEvaluator(nc, iou_type=metric, iou_thrs=[0.1])
    for det, gt in images:
        std.add_image(det, gt)
        loc.add_image(det, gt)

    out = {}
    for c in range(nc):
        ap_std, _ = std._ap_recall(c, "all")
        ap_loc, _ = loc._ap_recall(c, "all")
        if ap_std is None:
            continue
        # Oth: GT relabeled to c -> classification errors forgiven; dets of
        # class c only (single-class evaluator)
        oth = CocoEvaluator(1, iou_type=metric, iou_thrs=[0.1])
        for det, gt in images:
            sel = np.asarray(det["labels"]) == c
            det_c = {
                "bboxes": np.asarray(det["bboxes"], np.float64).reshape(-1, 4)[sel],
                "scores": np.asarray(det["scores"])[sel],
                "labels": np.zeros(int(sel.sum()), np.int64),
            }
            gt_c = dict(gt, labels=np.zeros(len(gt["labels"]), np.int64))
            if "masks" in det:
                det_c["masks"] = [m for m, s in zip(det["masks"], sel) if s]
            oth.add_image(det_c, gt_c)
        ap_oth, rec_oth = oth._ap_recall(0, "all")
        out[c] = {
            "C75": round(float(ap_std[5]), 4),
            "C50": round(float(ap_std[0]), 4),
            "Loc": round(float(ap_loc[0]), 4),
            "Oth": round(float(ap_oth[0]), 4) if ap_oth is not None else float("nan"),
            "BG": round(float(rec_oth[0]), 4) if rec_oth is not None else float("nan"),
            "FN": 1.0,
        }
    return out


def main():
    args = parse_args()
    per_class = analyze_dump(args.results, args.metric)
    if not per_class:
        sys.exit("no classes with ground truth in the dump")
    header = "class  " + "  ".join(f"{s:>6}" for s in STAGES)
    print(header)
    for c, row in per_class.items():
        print(f"{c:>5}  " + "  ".join(f"{row[s]:6.3f}" for s in STAGES))
    mean = {s: float(np.nanmean([r[s] for r in per_class.values()])) for s in STAGES}
    print(" mean  " + "  ".join(f"{mean[s]:6.3f}" for s in STAGES))

    if args.out:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            print("matplotlib unavailable; skipped plot")
            return
        classes = sorted(per_class)
        x = np.arange(len(classes))
        plt.figure(figsize=(max(6, len(classes)), 4))
        prev = np.zeros(len(classes))
        for s in STAGES:
            vals = np.asarray([per_class[c][s] for c in classes])
            plt.bar(x, np.maximum(vals - prev, 0), bottom=prev, label=s)
            prev = np.maximum(vals, prev)
        plt.xticks(x, [str(c) for c in classes])
        plt.xlabel("class")
        plt.ylabel("AP (cumulative as errors are forgiven)")
        plt.legend(fontsize=8)
        plt.savefig(args.out, dpi=150, bbox_inches="tight")
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
