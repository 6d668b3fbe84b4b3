"""End-to-end mask postprocess + COCO segm plumbing: perfect low-res mask
predictions must score ~1.0 segm mAP through finalize_masks_np -> RLE -> eval.

Guards the full predict-side mask chain (upsample -> crop -> resize -> thr ->
RLE -> matching) against alignment/orientation bugs.
"""

import numpy as np

from rsprompter_tpu.evaluation.coco_metric import CocoMetric
from rsprompter_tpu.models.roi_heads.bbox_head import DetResult


def _make_case(ori_h, ori_w, batch_in, low_res):
    """GT instances at ori res + 'perfect' low-res full-frame predictions."""
    rs = np.random.RandomState(0)
    n = 3
    gt_masks = np.zeros((n, ori_h, ori_w), np.uint8)
    boxes = []
    for i in range(n):
        y, x = rs.randint(0, ori_h // 2), rs.randint(0, ori_w // 2)
        h, w = rs.randint(20, 50), rs.randint(20, 50)
        gt_masks[i, y : y + h, x : x + w] = 1
        boxes.append([x, y, min(x + w, ori_w), min(y + h, ori_h)])
    boxes = np.asarray(boxes, np.float64)

    # test-pipeline geometry: keep-ratio resize into batch_in then pad
    scale = min(batch_in / ori_h, batch_in / ori_w)
    new_h, new_w = int(ori_h * scale + 0.5), int(ori_w * scale + 0.5)
    # simulate the model's low-res full-frame sigmoid output: GT resized into
    # the valid region of the (batch_in, batch_in) frame, then down to low_res
    frame = np.zeros((n, batch_in, batch_in), np.float32)
    import cv2

    for i in range(n):
        frame[i, :new_h, :new_w] = cv2.resize(
            gt_masks[i].astype(np.float32), (new_w, new_h)
        )
    probs = np.stack(
        [cv2.resize(f, (low_res, low_res)) for f in frame]
    ).clip(0, 1)

    meta = dict(
        img_id=1,
        ori_shape=(ori_h, ori_w),
        img_shape=(new_h, new_w),
        scale_factor=(new_w / ori_w, new_h / ori_h),
        batch_input_shape=(batch_in, batch_in),
    )
    gts = dict(
        bboxes=boxes,
        labels=np.zeros(n, np.int64),
        iscrowd=np.zeros(n, bool),
        areas=gt_masks.reshape(n, -1).sum(1).astype(np.float64),
        masks=gt_masks,
    )
    dets = DetResult(
        boxes=(boxes * scale)[None].astype(np.float32),  # input-space boxes
        scores=np.array([[0.9, 0.8, 0.7]], np.float32),
        labels=np.zeros((1, n), np.int32),
        valid=np.ones((1, n), bool),
    )
    return meta, gts, dets, probs[None]


def test_perfect_lowres_masks_score_high():
    meta, gts, dets, probs = _make_case(200, 160, 256, 64)
    metric = CocoMetric(num_classes=1)
    metric.process([meta], dets, probs, [gts])
    out = metric.compute()
    assert out["coco/bbox_mAP_50"] == 1.0
    # low-res roundtrip costs some boundary IoU but must be near-perfect @.5
    assert out["coco/segm_mAP_50"] == 1.0
    assert out["coco/segm_mAP"] > 0.5
