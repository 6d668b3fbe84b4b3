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


def test_dump_and_offline_eval_roundtrip(tmp_path):
    """CocoMetric(dump_path=...) + eval_metric.evaluate_dump must reproduce
    the online metrics exactly (tools/test.py --out workflow)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "analysis_tools",
        ),
    )
    from eval_metric import evaluate_dump

    meta, gts, dets, probs = _make_case(200, 160, 256, 64)
    dump = tmp_path / "results.json"
    metric = CocoMetric(num_classes=1, dump_path=str(dump))
    metric.process([meta], dets, probs, [gts])
    online = metric.compute()
    offline = evaluate_dump(str(dump))
    assert online.keys() == offline.keys()
    for k in online:
        np.testing.assert_equal(online[k], offline[k])  # NaN-safe equality
    assert offline["coco/segm_mAP_50"] == 1.0
    # metric subsetting
    bbox_only = evaluate_dump(str(dump), metrics=["bbox"])
    assert "coco/bbox_mAP" in bbox_only and "coco/segm_mAP" not in bbox_only
    # classwise per-category AP (reference CocoMetric classwise=True)
    cw = evaluate_dump(str(dump), classwise=True)
    assert cw["coco/bbox_cls0_precision"] == cw["coco/bbox_mAP"]
    metric_cw = CocoMetric(num_classes=1, classwise=True, class_names=["ship"])
    metric_cw.process([meta], dets, probs, [gts])
    out_cw = metric_cw.compute()
    assert out_cw["coco/bbox_ship_precision"] == out_cw["coco/bbox_mAP"]


def test_uint8_quantized_probs_match_fp32():
    """The uint8 transfer path (quantize_probs_u8 on device, probs_to_f32 /
    finalize_masks_np dequantizing host-side) must produce near-identical
    binary masks and identical mAP to the fp32 path."""
    import jax.numpy as jnp

    from rsprompter_tpu.ops.masks import (
        finalize_masks_np,
        probs_to_f32,
        quantize_probs_u8,
    )

    meta, gts, dets, probs = _make_case(200, 160, 256, 64)
    u8 = np.asarray(quantize_probs_u8(jnp.asarray(probs)))
    assert u8.dtype == np.uint8
    deq = probs_to_f32(u8)
    assert np.abs(deq - probs).max() <= 0.5 / 255 + 1e-7

    m_f32 = finalize_masks_np(
        probs[0], meta["batch_input_shape"], meta["ori_shape"],
        meta["scale_factor"],
    )
    m_u8 = finalize_masks_np(
        u8[0], meta["batch_input_shape"], meta["ori_shape"],
        meta["scale_factor"],
    )
    # a <=half-level boundary wobble: >99.9% of pixels agree
    agree = (m_f32 == m_u8).mean()
    assert agree > 0.999, agree

    metric = CocoMetric(num_classes=1)
    metric.process([meta], dets, u8, [gts])
    out = metric.compute()
    assert out["coco/segm_mAP_50"] == 1.0


def test_packed_bits_transfer_roundtrip():
    """bits mode: device pack (threshold @ low res + packbits) must invert
    exactly through unpack_mask_bits, and still eval to segm mAP50 = 1.0 on
    the synthetic perfect-mask case."""
    import jax.numpy as jnp

    from rsprompter_tpu.evaluation.rle import encode_masks  # noqa: F401
    from rsprompter_tpu.ops.masks import (
        finalize_masks_np,
        pack_mask_bits,
        unpack_mask_bits,
    )

    meta, gts, dets, probs = _make_case(200, 160, 256, 64)
    packed = np.asarray(pack_mask_bits(jnp.asarray(probs)))
    assert packed.shape == probs.shape[:-1] + (probs.shape[-1] // 8,)
    unpacked = unpack_mask_bits(packed, probs.shape[-1])
    np.testing.assert_array_equal(unpacked, (probs >= 0.5).astype(np.float32))

    masks = finalize_masks_np(
        unpacked[0], meta["batch_input_shape"], meta["ori_shape"],
        meta["scale_factor"],
    )
    metric = CocoMetric(num_classes=1)
    metric.process([meta], dets, unpacked, [gts])
    assert metric.compute()["coco/segm_mAP_50"] == 1.0
    assert masks.dtype == bool


def test_bbox_only_dump_loads(tmp_path):
    """A bbox-only metric run never RLE-encodes the GT masks; the dump must
    still serialize them as RLE (not nested pixel lists) and reload."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "analysis_tools",
        ),
    )
    from eval_metric import evaluate_dump

    meta, gts, dets, probs = _make_case(200, 160, 256, 64)
    dump = tmp_path / "bboxonly.json"
    metric = CocoMetric(num_classes=1, metric=("bbox",), dump_path=str(dump))
    metric.process([meta], dets, probs, [gts])
    online = metric.compute()
    assert dump.stat().st_size < 200_000  # RLE, not pixel lists
    offline = evaluate_dump(str(dump))
    assert offline["coco/bbox_mAP_50"] == online["coco/bbox_mAP_50"] == 1.0


def test_pack_predict_flat_roundtrip():
    """flat mode: DetResult fields + packed mask bits in ONE uint8 buffer
    (one device->host transfer) must invert exactly."""
    import jax.numpy as jnp

    from rsprompter_tpu.models.roi_heads.bbox_head import DetResult
    from rsprompter_tpu.ops.masks import (
        pack_mask_bits,
        pack_predict_flat,
        unpack_predict_flat,
    )

    rng = np.random.default_rng(0)
    b, n, h, w = 2, 7, 32, 64
    dets = DetResult(
        boxes=jnp.asarray(rng.uniform(0, 100, (b, n, 4)).astype(np.float32)),
        scores=jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32)),
        labels=jnp.asarray(rng.integers(0, 5, (b, n)).astype(np.int32)),
        valid=jnp.asarray(rng.integers(0, 2, (b, n)).astype(bool)),
    )
    probs = rng.uniform(0, 1, (b, n, h, w)).astype(np.float32)
    bits = pack_mask_bits(jnp.asarray(probs))
    buf = np.asarray(pack_predict_flat(dets, bits))
    assert buf.dtype == np.uint8 and buf.shape == (b, 25 * n + n * h * (w // 8))

    out = unpack_predict_flat(buf, n, (h, w // 8))
    np.testing.assert_array_equal(out["boxes"], np.asarray(dets.boxes))
    np.testing.assert_array_equal(out["scores"], np.asarray(dets.scores))
    np.testing.assert_array_equal(out["labels"], np.asarray(dets.labels))
    np.testing.assert_array_equal(out["valid"], np.asarray(dets.valid))
    np.testing.assert_array_equal(out["mask_bits"], np.asarray(bits))
