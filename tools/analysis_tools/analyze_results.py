"""Rank evaluated images by per-image AP and render the best/worst cases.

Behavior parity with the reference ``tools/analysis_tools/analyze_results.py``
(score every image by its own mAP, save the top-k 'good' and bottom-k 'bad'
prediction visualizations), driven by the self-contained JSON dump from
``tools/test.py --out`` instead of a pkl + dataset rebuild.

Usage:
  python tools/test.py CONFIG CKPT --out results.json
  python tools/analysis_tools/analyze_results.py results.json \
      --out-dir /tmp/analysis [--topk 5] [--show-score-thr 0.3]

Writes ``good/NAME_{ap}.jpg`` / ``bad/NAME_{ap}.jpg`` with predictions drawn
over the original image (GT in thin white boxes for comparison).
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


def parse_args():
    p = argparse.ArgumentParser(description="rank + render eval results")
    p.add_argument("results", help="JSON dump from tools/test.py --out")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--show-score-thr", type=float, default=0.3)
    return p.parse_args()


def per_image_ap(dump: dict) -> list:
    """-> [(ap_or_nan, record), ...] one per dumped image (bbox AP)."""
    from rsprompter_tpu.evaluation.coco_eval import CocoEvaluator
    from rsprompter_tpu.evaluation.coco_metric import from_jsonable

    scored = []
    for rec in dump["images"]:
        ev = CocoEvaluator(dump["num_classes"], iou_type="bbox")
        ev.add_image(from_jsonable(rec["det"]), from_jsonable(rec["gt"]))
        ap = ev.summarize()["bbox_mAP"]
        scored.append((ap, rec))
    return scored


def _render(rec: dict, score_thr: float):
    import cv2

    from rsprompter_tpu.apis.inferencer import draw_predictions
    from rsprompter_tpu.evaluation.rle import RLE, decode_mask

    img = cv2.imread(rec["meta"]["img_path"])
    if img is None:
        return None
    det = rec["det"]
    scores = np.asarray(det["scores"], np.float32)
    keep = scores > score_thr
    masks = None
    if det.get("masks"):
        masks = np.stack(
            [decode_mask(RLE.from_coco(m)) for m in det["masks"]]
        )[keep].astype(bool)
    pred = dict(
        bboxes=np.asarray(det["bboxes"], np.float32).reshape(-1, 4)[keep].tolist(),
        scores=scores[keep].tolist(),
        labels=np.asarray(det["labels"], np.int64)[keep].tolist(),
    )
    if masks is not None:
        pred["masks"] = masks
    vis = draw_predictions(img.astype(np.float32), pred)
    for box in np.asarray(rec["gt"]["bboxes"], np.float32).reshape(-1, 4):
        x1, y1, x2, y2 = [int(v) for v in box]
        cv2.rectangle(vis, (x1, y1), (x2, y2), (255, 255, 255), 1)
    return vis


def main():
    args = parse_args()
    import cv2

    with open(args.results) as f:
        dump = json.load(f)
    if not dump["images"] or "meta" not in dump["images"][0]:
        sys.exit("dump has no image metadata (re-run tools/test.py --out)")
    scored = [
        (ap, rec) for ap, rec in per_image_ap(dump) if not np.isnan(ap)
    ]
    scored.sort(key=lambda t: t[0])
    for group, sel in (
        ("bad", scored[: args.topk]),
        ("good", scored[-args.topk:][::-1]),
    ):
        gdir = os.path.join(args.out_dir, group)
        os.makedirs(gdir, exist_ok=True)
        for ap, rec in sel:
            vis = _render(rec, args.show_score_thr)
            if vis is None:
                continue
            base = os.path.splitext(
                os.path.basename(rec["meta"]["img_path"]) or
                f"img_{rec['meta']['img_id']}"
            )[0]
            name = f"{base}_{ap:.3f}.jpg"
            cv2.imwrite(os.path.join(gdir, name), vis)
            print(f"{group}: {name}")


if __name__ == "__main__":
    main()
