#!/usr/bin/env python
"""Sliced inference on a large scene (satellite imagery).

Behavior parity with the reference ``demo/large_image_demo.py`` (sahi
slicing -> per-patch inference -> shift -> NMS merge), TPU-redesigned:
uniform fixed-size patches batch through the static-shape inferencer (one
compile, a few big batches) instead of the reference's per-patch loop.

Usage:
  python tools/large_image_demo.py BIG_IMG CONFIG [CKPT] --out-dir out \
      [--patch 1024] [--overlap 0.25] [--score-thr 0.3] [--merge-iou 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="sliced large-image inference")
    p.add_argument("image")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--patch", type=int, default=None,
                   help="tile size (default: config crop)")
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--merge-iou", type=float, default=0.5)
    return p.parse_args()


def main():
    args = parse_args()
    from rsprompter_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import cv2

    from rsprompter_tpu.apis.inferencer import DetInferencer, draw_predictions
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.utils.large_image import (
        merge_patch_predictions,
        paste_scene_masks,
        slice_offsets,
    )

    img = cv2.imread(args.image, cv2.IMREAD_COLOR)
    if img is None:
        sys.exit(f"unreadable image {args.image}")
    h, w = img.shape[:2]
    cfg = Config.fromfile(args.config)
    patch = args.patch or tuple(cfg.get("crop_size", (1024, 1024)))[0]
    offsets = slice_offsets(h, w, patch, args.overlap)
    print(f"{w}x{h} scene -> {len(offsets)} patches of {patch}^2 "
          f"(overlap {args.overlap})")

    inferencer = DetInferencer(
        cfg, weights=args.checkpoint, batch_size=args.batch_size,
        size_buckets=[patch],
    )
    tiles = [
        img[y0 : y0 + min(patch, h), x0 : x0 + min(patch, w)]
        for x0, y0 in offsets
    ]
    preds = inferencer(tiles, return_masks=True, score_thr=args.score_thr)[
        "predictions"
    ]
    merged = merge_patch_predictions(
        preds, offsets, (h, w), iou_thr=args.merge_iou
    )
    print(f"{sum(len(p['scores']) for p in preds)} patch dets "
          f"-> {len(merged['scores'])} after shift+NMS merge")

    os.makedirs(args.out_dir, exist_ok=True)
    vis_pred = dict(
        bboxes=merged["bboxes"].tolist(), scores=merged["scores"].tolist(),
        labels=merged["labels"].tolist(),
    )
    vis = img.astype(np.float32)
    if merged["masks"] is not None:
        # blend masks one at a time (O(H*W) peak, not O(dets*H*W))
        vis = vis.astype(np.uint8).copy()
        green = np.asarray((0, 255, 0), np.float32)
        for m in paste_scene_masks(merged["masks"], (h, w)):
            vis[m] = (0.5 * vis[m] + 0.5 * green).astype(np.uint8)
        vis = vis.astype(np.float32)
    vis = draw_predictions(vis, vis_pred)
    name = os.path.basename(args.image)
    cv2.imwrite(os.path.join(args.out_dir, name), vis)
    with open(os.path.join(args.out_dir, "predictions.json"), "w") as f:
        json.dump({k: v for k, v in vis_pred.items() if k != "masks"}, f)
    print(f"wrote {os.path.join(args.out_dir, name)}")


if __name__ == "__main__":
    main()
