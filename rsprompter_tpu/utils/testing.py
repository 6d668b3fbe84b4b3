"""Synthetic batch fixtures — the JAX analogue of the reference's
``mmdet/testing/_utils.py`` ``demo_mm_inputs`` (SURVEY §4): random images +
padded GT boxes/labels/masks with validity masks, shaped for the on-device
batch contract used by every detector in this framework.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def demo_batch(
    batch_size: int = 2,
    image_size: Tuple[int, int] = (64, 64),
    max_gt: int = 4,
    num_classes: int = 1,
    num_gts: Tuple[int, ...] = None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    h, w = image_size
    images = rs.randn(batch_size, h, w, 3).astype(np.float32)
    gt_bboxes = np.zeros((batch_size, max_gt, 4), np.float32)
    gt_labels = np.zeros((batch_size, max_gt), np.int32)
    gt_valid = np.zeros((batch_size, max_gt), bool)
    gt_masks = np.zeros((batch_size, max_gt, h, w), np.float32)
    for b in range(batch_size):
        n = num_gts[b] if num_gts is not None else rs.randint(1, max_gt + 1)
        for g in range(min(n, max_gt)):
            cx, cy = rs.rand(2) * [w * 0.6, h * 0.6] + [w * 0.2, h * 0.2]
            bw, bh = rs.rand(2) * [w * 0.3, h * 0.3] + 4
            x1, y1 = max(cx - bw / 2, 0), max(cy - bh / 2, 0)
            x2, y2 = min(cx + bw / 2, w), min(cy + bh / 2, h)
            gt_bboxes[b, g] = [x1, y1, x2, y2]
            gt_labels[b, g] = rs.randint(num_classes)
            gt_valid[b, g] = True
            gt_masks[b, g, int(y1) : int(y2), int(x1) : int(x2)] = 1.0
    return {
        "images": images,
        "img_shape": np.array([[h, w]] * batch_size, np.int32),
        "ori_shape": np.array([[h, w]] * batch_size, np.int32),
        "scale_factor": np.ones((batch_size, 2), np.float32),
        "gt_bboxes": gt_bboxes,
        "gt_labels": gt_labels,
        "gt_valid": gt_valid,
        "gt_masks": gt_masks,
    }
