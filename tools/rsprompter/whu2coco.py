#!/usr/bin/env python
"""Convert WHU building semantic masks to COCO instance annotations.

Behavior parity: reference ``tools/rsprompter/whu2coco.py`` — instances are
the connected components of the binary building mask
(``cv2.connectedComponentsWithStats``), each emitting a polygon + bbox + area.

Usage: python tools/rsprompter/whu2coco.py IMG_DIR MASK_DIR OUT_JSON
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def mask_to_coco_anns(mask: np.ndarray, image_id: int, next_ann_id: int):
    import cv2

    anns = []
    num, labels, stats, _ = cv2.connectedComponentsWithStats(
        (mask > 0).astype(np.uint8), connectivity=8
    )
    for comp in range(1, num):
        x, y, w, h, area = stats[comp]
        if area < 4:
            continue
        comp_mask = (labels == comp).astype(np.uint8)
        contours, _ = cv2.findContours(
            comp_mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        segs = [c.reshape(-1).astype(float).tolist() for c in contours if len(c) >= 3]
        if not segs:
            continue
        anns.append(
            dict(
                id=next_ann_id + len(anns),
                image_id=image_id,
                category_id=1,
                bbox=[float(x), float(y), float(w), float(h)],
                area=float(area),
                segmentation=segs,
                iscrowd=0,
            )
        )
    return anns


def main():
    import cv2

    p = argparse.ArgumentParser()
    p.add_argument("img_dir")
    p.add_argument("mask_dir")
    p.add_argument("out_json")
    args = p.parse_args()

    images, annotations = [], []
    ann_id = 1
    files = sorted(os.listdir(args.img_dir))
    for img_id, fname in enumerate(files, 1):
        img_path = os.path.join(args.img_dir, fname)
        mask_path = os.path.join(args.mask_dir, fname)
        img = cv2.imread(img_path)
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        if img is None or mask is None:
            print(f"skip {fname} (missing image or mask)", file=sys.stderr)
            continue
        h, w = img.shape[:2]
        images.append(dict(id=img_id, file_name=fname, height=h, width=w))
        anns = mask_to_coco_anns(mask, img_id, ann_id)
        annotations.extend(anns)
        ann_id += len(anns)

    out = dict(
        info={}, licenses=[],
        categories=[dict(id=1, name="building", supercategory=None)],
        images=images, annotations=annotations,
    )
    with open(args.out_json, "w") as f:
        json.dump(out, f)
    print(f"{len(images)} images, {len(annotations)} instances -> {args.out_json}")


if __name__ == "__main__":
    main()
