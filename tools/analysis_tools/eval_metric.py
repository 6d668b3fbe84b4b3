"""Offline re-evaluation of dumped predictions (no model, no device).

Behavior parity with the reference ``tools/analysis_tools/eval_metric.py``
(re-run the evaluator over ``tools/test.py --out`` results), except the dump
is self-contained JSON (detections + RLE masks + ground truth), so no config
or dataset rebuild is needed.

Usage:
  python tools/test.py CONFIG CKPT --out results.json
  python tools/analysis_tools/eval_metric.py results.json [--metrics bbox segm]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def parse_args():
    p = argparse.ArgumentParser(description="re-evaluate dumped results")
    p.add_argument("results", help="JSON dump from tools/test.py --out")
    p.add_argument("--metrics", nargs="+", default=None,
                   help="subset of the dump's metrics (default: all)")
    p.add_argument("--classwise", action="store_true",
                   help="also report per-category AP")
    return p.parse_args()


def evaluate_dump(path: str, metrics=None, classwise: bool = False) -> dict:
    from rsprompter_tpu.evaluation.coco_eval import CocoEvaluator
    from rsprompter_tpu.evaluation.coco_metric import from_jsonable

    with open(path) as f:
        dump = json.load(f)
    metrics = tuple(metrics or dump["metrics"])
    unknown = set(metrics) - set(dump["metrics"])
    if unknown:
        raise ValueError(f"metrics {sorted(unknown)} not in dump "
                         f"(has {dump['metrics']})")
    evaluators = {
        m: CocoEvaluator(dump["num_classes"], iou_type=m) for m in metrics
    }
    for rec in dump["images"]:
        det = from_jsonable(rec["det"])
        gt = from_jsonable(rec["gt"])
        for m in metrics:
            evaluators[m].add_image(det, gt)
    out = {}
    for m in metrics:
        for k, v in evaluators[m].summarize().items():
            out[f"coco/{k}"] = v
        if classwise:
            for c, ap in evaluators[m].per_class_ap().items():
                out[f"coco/{m}_cls{c}_precision"] = ap["AP"]
    return out


def main():
    args = parse_args()
    out = evaluate_dump(args.results, args.metrics, args.classwise)
    for k, v in out.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
