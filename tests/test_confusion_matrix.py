"""Confusion-matrix accumulation (tools/analysis_tools/confusion_matrix.py)."""

import importlib.util
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "confusion_matrix", os.path.join(REPO, "tools/analysis_tools/confusion_matrix.py")
)
cm = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cm)


def test_accumulate_tp_fp_miss():
    conf = np.zeros((3, 3), np.int64)  # 2 classes + background
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_labels = np.array([0, 1])
    # pred 1: TP class 0; pred 2: wrong class on gt 2; pred 3: FP far away
    pred_boxes = np.array(
        [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], np.float32
    )
    pred_labels = np.array([0, 0, 1])
    pred_scores = np.array([0.9, 0.8, 0.7])
    cm.accumulate(conf, pred_boxes, pred_labels, pred_scores,
                  gt_boxes, gt_labels, 0.3, 0.5)
    assert conf[0, 0] == 1          # true positive
    assert conf[1, 0] == 1          # gt class 1 predicted as class 0
    assert conf[2, 1] == 1          # unmatched prediction -> background row
    assert conf.sum() == 3


def test_accumulate_score_threshold_and_miss():
    conf = np.zeros((2, 2), np.int64)
    gt_boxes = np.array([[0, 0, 10, 10]], np.float32)
    gt_labels = np.array([0])
    pred_boxes = np.array([[0, 0, 10, 10]], np.float32)
    cm.accumulate(conf, pred_boxes, np.array([0]), np.array([0.1]),
                  gt_boxes, gt_labels, 0.3, 0.5)
    assert conf[0, 1] == 1  # below score_thr -> GT missed (background col)
    assert conf.sum() == 1


def test_bbox_iou():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[5, 0, 15, 10], [20, 20, 30, 30]], np.float32)
    iou = cm.bbox_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 50 / 150, atol=1e-6)
    assert iou[0, 1] == 0
