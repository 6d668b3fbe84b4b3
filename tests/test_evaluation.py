"""Tests: native RLE ops and the COCO-style evaluator."""

import numpy as np
import pytest

from rsprompter_tpu.evaluation.coco_eval import CocoEvaluator, bbox_iou_np
from rsprompter_tpu.evaluation.rle import (
    _load_lib,
    decode_mask,
    encode_masks,
    iou_matrix,
)


def _rand_masks(rs, n, h, w):
    masks = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        y, x = rs.randint(0, h - 5), rs.randint(0, w - 5)
        masks[i, y : y + rs.randint(2, 6), x : x + rs.randint(2, 6)] = 1
    return masks


def test_native_lib_builds():
    assert _load_lib() is not None, "native librle.so failed to build/load"


def test_rle_roundtrip():
    rs = np.random.RandomState(0)
    masks = _rand_masks(rs, 5, 17, 23)
    rles = encode_masks(masks)
    for m, r in zip(masks, rles):
        assert r.area() == m.sum()
        np.testing.assert_array_equal(decode_mask(r), m)
        # counts sum to H*W, starts with a 0-run count
        assert r.counts.sum() == 17 * 23


def test_rle_iou_matches_dense():
    rs = np.random.RandomState(1)
    dets = _rand_masks(rs, 6, 20, 20)
    gts = _rand_masks(rs, 4, 20, 20)
    got = iou_matrix(encode_masks(dets), encode_masks(gts))
    dm = dets.reshape(6, -1).astype(np.float64)
    gm = gts.reshape(4, -1).astype(np.float64)
    inter = dm @ gm.T
    union = dm.sum(1)[:, None] + gm.sum(1)[None] - inter
    ref = np.where(union > 0, inter / union, 0)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_rle_iou_crowd_uses_det_area():
    det = np.zeros((1, 10, 10), np.uint8)
    det[0, :5, :5] = 1  # area 25
    gt = np.ones((1, 10, 10), np.uint8)  # crowd covering everything
    iou = iou_matrix(encode_masks(det), encode_masks(gt), iscrowd=[True])
    assert iou[0, 0] == pytest.approx(1.0)  # inter/det_area = 25/25


def _perfect_case(n=5):
    rs = np.random.RandomState(2)
    boxes = []
    for _ in range(n):
        x, y = rs.rand(2) * 50
        w, h = rs.rand(2) * 30 + 40  # large-ish areas
        boxes.append([x, y, x + w, y + h])
    boxes = np.array(boxes)
    gts = dict(
        bboxes=boxes, labels=np.zeros(n, np.int64),
        iscrowd=np.zeros(n, bool),
        areas=(boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
    )
    dets = dict(
        bboxes=boxes.copy(), scores=np.linspace(0.9, 0.5, n),
        labels=np.zeros(n, np.int64),
    )
    return dets, gts


def test_coco_eval_perfect_predictions():
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    dets, gts = _perfect_case()
    ev.add_image(dets, gts)
    m = ev.summarize()
    assert m["bbox_mAP"] == pytest.approx(1.0, abs=0.01)
    assert m["bbox_mAP_50"] == pytest.approx(1.0, abs=0.01)


def test_coco_eval_false_positive_lowers_ap():
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    dets, gts = _perfect_case()
    # add a top-scoring false positive far away
    dets["bboxes"] = np.vstack([[500, 500, 540, 540], dets["bboxes"]])
    dets["scores"] = np.concatenate([[0.99], dets["scores"]])
    dets["labels"] = np.concatenate([[0], dets["labels"]])
    ev.add_image(dets, gts)
    m = ev.summarize()
    assert 0.5 < m["bbox_mAP"] < 1.0


def test_coco_eval_missed_gt():
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    dets, gts = _perfect_case(4)
    dets["bboxes"] = dets["bboxes"][:2]
    dets["scores"] = dets["scores"][:2]
    dets["labels"] = dets["labels"][:2]
    ev.add_image(dets, gts)
    m = ev.summarize()
    # recall capped at 0.5 -> AP ~ 0.5 (101-pt interp includes recall=0.5 point)
    assert 0.4 < m["bbox_mAP"] <= 0.51


def test_coco_eval_localization_quality():
    # det shifted so IoU ~ 0.6: counts at thr .5/.55/.6 only
    gt_box = np.array([[0.0, 0.0, 100.0, 100.0]])
    det_box = np.array([[0.0, 25.0, 100.0, 125.0]])  # IoU = 75/125 = 0.6
    ev = CocoEvaluator(num_classes=1, iou_type="bbox")
    ev.add_image(
        dict(bboxes=det_box, scores=np.array([0.9]), labels=np.array([0])),
        dict(bboxes=gt_box, labels=np.array([0]), iscrowd=np.array([False]),
             areas=np.array([10000.0])),
    )
    m = ev.summarize()
    assert m["bbox_mAP_50"] == pytest.approx(1.0, abs=0.01)
    assert m["bbox_mAP_75"] == pytest.approx(0.0, abs=0.01)
    assert m["bbox_mAP"] == pytest.approx(0.3, abs=0.02)  # 3/10 thresholds


def test_coco_eval_segm():
    rs = np.random.RandomState(3)
    masks = _rand_masks(rs, 3, 64, 64)
    rles = encode_masks(masks)
    boxes = np.array([[0, 0, 10, 10]] * 3, np.float64)
    ev = CocoEvaluator(num_classes=1, iou_type="segm")
    ev.add_image(
        dict(bboxes=boxes, scores=np.array([0.9, 0.8, 0.7]),
             labels=np.zeros(3, np.int64), masks=rles),
        dict(bboxes=boxes, labels=np.zeros(3, np.int64),
             iscrowd=np.zeros(3, bool),
             areas=np.array([r.area() for r in rles], np.float64),
             masks=rles),
    )
    m = ev.summarize()
    assert m["segm_mAP"] == pytest.approx(1.0, abs=0.01)


def test_native_matcher_parity_randomized():
    """The C++ match_image must reproduce the Python greedy loop exactly
    across random IoU matrices with crowd/ignore flags."""
    from rsprompter_tpu.evaluation import coco_eval
    from rsprompter_tpu.evaluation.coco_eval import IOU_THRS, _match_image, _match_lib

    lib = _match_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(0)
    for case in range(20):
        d, g = rs.randint(1, 12), rs.randint(1, 8)
        ious = rs.rand(d, g)
        # gts sorted non-ignored-first, as add_image guarantees
        gt_ignore = np.sort(rs.rand(g) < 0.3)
        gt_crowd = gt_ignore & (rs.rand(g) < 0.5)
        det_areas = rs.rand(d) * 5000
        rng = (100.0, 4000.0)
        native = _match_image(ious, gt_ignore, gt_crowd, det_areas, rng, IOU_THRS)
        orig = coco_eval._match_lib
        coco_eval._match_lib = lambda: None  # force the Python loop
        try:
            py = _match_image(ious, gt_ignore, gt_crowd, det_areas, rng, IOU_THRS)
        finally:
            coco_eval._match_lib = orig
        np.testing.assert_array_equal(native[0], py[0], err_msg=f"case {case}")
        np.testing.assert_array_equal(native[1], py[1], err_msg=f"case {case}")


def test_custom_iou_ladder_summarize_and_per_class():
    """A custom iou_thrs ladder (e.g. [0.1] in the error-analysis tool) must
    not crash summarize/per_class_ap; mAP_50/_75 become NaN when absent."""
    boxes = np.array([[0, 0, 10, 10]], np.float64)
    for thrs, has50 in (([0.1], False), ([0.5, 0.75], True)):
        ev = CocoEvaluator(num_classes=1, iou_thrs=thrs)
        ev.add_image(
            dict(bboxes=boxes, scores=np.array([0.9]),
                 labels=np.zeros(1, np.int64)),
            dict(bboxes=boxes, labels=np.zeros(1, np.int64),
                 iscrowd=np.zeros(1, bool), areas=np.array([100.0])),
        )
        m = ev.summarize()
        pc = ev.per_class_ap()
        assert m["bbox_mAP"] == 1.0
        if has50:
            assert m["bbox_mAP_50"] == 1.0 and pc[0]["AP50"] == 1.0
        else:
            assert np.isnan(m["bbox_mAP_50"]) and np.isnan(pc[0]["AP50"])
