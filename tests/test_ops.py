"""Tests for detection ops: boxes, NMS, RoIAlign, grid sampling."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rsprompter_tpu.ops.boxes import (
    DeltaXYWHBBoxCoder,
    bbox_cxcywh_to_xyxy,
    bbox_overlaps,
    bbox_xyxy_to_cxcywh,
)
from rsprompter_tpu.ops.nms import batched_nms, nms_padded
from rsprompter_tpu.ops.roi_align import roi_align
from rsprompter_tpu.ops.sampling import grid_sample_nhwc, point_sample


def _np_iou(a, b):
    area1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area1[:, None] + area2[None] - inter, 1e-6)


def _rand_boxes(rs, n, size=100):
    xy = rs.rand(n, 2) * size * 0.7
    wh = rs.rand(n, 2) * size * 0.3 + 1
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_bbox_overlaps():
    rs = np.random.RandomState(0)
    a, b = _rand_boxes(rs, 10), _rand_boxes(rs, 7)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-5)


def test_box_format_roundtrip():
    rs = np.random.RandomState(0)
    b = _rand_boxes(rs, 5)
    out = np.asarray(bbox_cxcywh_to_xyxy(bbox_xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-5)


def test_delta_coder_roundtrip():
    rs = np.random.RandomState(1)
    proposals = _rand_boxes(rs, 20)
    gts = _rand_boxes(rs, 20)
    coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
    deltas = coder.encode(jnp.asarray(proposals), jnp.asarray(gts))
    decoded = np.asarray(coder.decode(jnp.asarray(proposals), deltas))
    np.testing.assert_allclose(decoded, gts, atol=1e-3)


def _np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = _np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thr
        suppressed[i] = True
    return keep


def test_nms_matches_numpy_greedy():
    rs = np.random.RandomState(2)
    boxes = _rand_boxes(rs, 60, size=50)
    scores = rs.rand(60).astype(np.float32)
    ref = _np_greedy_nms(boxes, scores, 0.5)
    idx, keep, out_boxes, out_scores = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), iou_thr=0.5, max_out=60
    )
    got = np.asarray(idx)[np.asarray(keep)]
    assert list(got) == ref
    # kept scores are sorted desc
    ks = np.asarray(out_scores)[np.asarray(keep)]
    assert np.all(np.diff(ks) <= 0)


def test_nms_respects_valid_mask_and_max_out():
    rs = np.random.RandomState(3)
    boxes = _rand_boxes(rs, 30, size=50)
    scores = rs.rand(30).astype(np.float32)
    valid = np.arange(30) < 15
    idx, keep, _, _ = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), iou_thr=0.5, max_out=5,
        valid=jnp.asarray(valid),
    )
    assert keep.shape == (5,)
    assert np.all(np.asarray(idx)[np.asarray(keep)] < 15)


def test_batched_nms_keeps_classes_separate():
    # two identical boxes in different classes must both survive
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    _, keep, _, _ = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs),
        iou_thr=0.5, max_out=2,
    )
    assert np.asarray(keep).sum() == 2
    _, keep2, _, _ = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs),
        iou_thr=0.5, max_out=2, class_agnostic=True,
    )
    assert np.asarray(keep2).sum() == 1


def _np_roi_align_aligned(feat_nchw, rois, out, scale, ratio):
    """Direct transcription of the mmcv aligned RoIAlign sampling rules."""
    n, c, h, w = feat_nchw.shape
    r = len(rois)
    res = np.zeros((r, c, out, out), np.float32)
    for ri, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = roi[1:] * scale - 0.5
        bh, bw = (y2 - y1) / out, (x2 - x1) / out
        for oy in range(out):
            for ox in range(out):
                acc = np.zeros(c, np.float32)
                for sy in range(ratio):
                    for sx in range(ratio):
                        y = y1 + (oy + (sy + 0.5) / ratio) * bh
                        x = x1 + (ox + (sx + 0.5) / ratio) * bw
                        if y < -1 or y > h or x < -1 or x > w:
                            continue
                        y, x = max(y, 0), max(x, 0)
                        y0, x0 = min(int(np.floor(y)), h - 1), min(int(np.floor(x)), w - 1)
                        y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = min(max(y - y0, 0), 1), min(max(x - x0, 0), 1)
                        acc += (
                            feat_nchw[b, :, y0, x0] * (1 - ly) * (1 - lx)
                            + feat_nchw[b, :, y0, x1_] * (1 - ly) * lx
                            + feat_nchw[b, :, y1_, x0] * ly * (1 - lx)
                            + feat_nchw[b, :, y1_, x1_] * ly * lx
                        )
                res[ri, :, oy, ox] = acc / (ratio * ratio)
    return res


def test_roi_align_matches_reference():
    rs = np.random.RandomState(4)
    feat = rs.randn(2, 16, 16, 3).astype(np.float32)
    rois = np.array(
        [
            [0, 2.0, 2.0, 12.0, 10.0],
            [1, 0.0, 0.0, 16.0, 16.0],
            [0, 5.5, 3.25, 7.75, 9.0],
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), (4, 4), 1.0, 2)
    ).transpose(0, 3, 1, 2)
    ref = _np_roi_align_aligned(feat.transpose(0, 3, 1, 2), rois, 4, 1.0, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(align_corners):
    rs = np.random.RandomState(5)
    img = rs.randn(2, 8, 10, 4).astype(np.float32)
    grid = (rs.rand(2, 17, 2) * 2.4 - 1.2).astype(np.float32)  # incl. out-of-range
    got = np.asarray(
        grid_sample_nhwc(jnp.asarray(img), jnp.asarray(grid), align_corners)
    )
    t = F.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid[:, :, None, :]),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )  # (B, C, P, 1)
    ref = t.numpy()[:, :, :, 0].transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_point_sample_center():
    img = np.zeros((1, 4, 4, 1), np.float32)
    img[0, 1:3, 1:3, 0] = 1.0
    out = np.asarray(point_sample(jnp.asarray(img), jnp.asarray([[[0.5, 0.5]]])))
    assert out[0, 0, 0] == pytest.approx(1.0)


def test_fused_extract_matches_per_level_roi_align():
    from rsprompter_tpu.models.roi_heads.roi_extractor import (
        extract_roi_feats,
        map_roi_levels,
    )

    rs = np.random.RandomState(7)
    feats = [
        jnp.asarray(rs.randn(2, 64 // (2 ** i), 64 // (2 ** i), 8).astype(np.float32))
        for i in range(4)
    ]
    boxes = np.zeros((20, 4), np.float32)
    xy = rs.rand(20, 2) * 150
    wh = rs.rand(20, 2) * 80 + 8
    boxes[:, :2] = xy
    boxes[:, 2:] = xy + wh
    rois = jnp.asarray(
        np.concatenate([rs.randint(0, 2, (20, 1)).astype(np.float32), boxes], 1)
    )
    got = np.asarray(extract_roi_feats(feats, rois, (7, 7), (4, 8, 16, 32)))
    lvl = np.asarray(map_roi_levels(rois, 4))
    ref = np.zeros_like(got)
    for l, (f, st) in enumerate(zip(feats, (4, 8, 16, 32))):
        fl = np.asarray(roi_align(f, rois, (7, 7), 1.0 / st, 2))
        ref[lvl == l] = fl[lvl == l]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fused_extract_adaptive_matches_mmcv_rule():
    """sampling_ratio=0 (adaptive ceil(bin) grid) vs the numpy mmcv kernel."""
    from rsprompter_tpu.models.roi_heads.roi_extractor import (
        extract_roi_feats,
        map_roi_levels,
    )

    rs = np.random.RandomState(11)
    feats = [
        jnp.asarray(rs.randn(1, 64 // (2 ** i), 64 // (2 ** i), 3).astype(np.float32))
        for i in range(4)
    ]
    strides = (4, 8, 16, 32)
    boxes = np.zeros((12, 4), np.float32)
    xy = rs.rand(12, 2) * 120
    wh = rs.rand(12, 2) * 120 + 10
    boxes[:, :2] = xy
    boxes[:, 2:] = xy + wh
    rois = jnp.asarray(np.concatenate([np.zeros((12, 1), np.float32), boxes], 1))
    got = np.asarray(
        extract_roi_feats(feats, rois, (7, 7), strides, sampling_ratio=0)
    )
    lvl = np.asarray(map_roi_levels(rois, 4))
    rois_np = np.asarray(rois)
    for i in range(12):
        st = strides[lvl[i]]
        f = np.asarray(feats[lvl[i]]).transpose(0, 3, 1, 2)
        bin_h = (rois_np[i, 4] - rois_np[i, 2]) * (1.0 / st) / 7
        bin_w = (rois_np[i, 3] - rois_np[i, 1]) * (1.0 / st) / 7
        ratio_h = int(np.clip(np.ceil(bin_h), 1, 4))
        ratio_w = int(np.clip(np.ceil(bin_w), 1, 4))
        ref = _np_roi_align_aligned_hw(
            f, rois_np[i : i + 1], 7, 1.0 / st, ratio_h, ratio_w
        )
        np.testing.assert_allclose(
            got[i].transpose(2, 0, 1), ref[0], atol=2e-4,
            err_msg=f"roi {i} lvl {lvl[i]} ratios {ratio_h}x{ratio_w}",
        )


def _np_roi_align_aligned_hw(feat_nchw, rois, out, scale, ratio_h, ratio_w):
    """mmcv aligned RoIAlign with separate h/w sampling counts."""
    n, c, h, w = feat_nchw.shape
    res = np.zeros((len(rois), c, out, out), np.float32)
    for ri, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = roi[1:] * scale - 0.5
        bh, bw = (y2 - y1) / out, (x2 - x1) / out
        for oy in range(out):
            for ox in range(out):
                acc = np.zeros(c, np.float32)
                for sy in range(ratio_h):
                    for sx in range(ratio_w):
                        y = y1 + (oy + (sy + 0.5) / ratio_h) * bh
                        x = x1 + (ox + (sx + 0.5) / ratio_w) * bw
                        if y < -1 or y > h or x < -1 or x > w:
                            continue
                        y, x = max(y, 0), max(x, 0)
                        y0, x0 = min(int(np.floor(y)), h - 1), min(int(np.floor(x)), w - 1)
                        y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = min(max(y - y0, 0), 1), min(max(x - x0, 0), 1)
                        acc += (
                            feat_nchw[b, :, y0, x0] * (1 - ly) * (1 - lx)
                            + feat_nchw[b, :, y0, x1_] * (1 - ly) * lx
                            + feat_nchw[b, :, y1_, x0] * ly * (1 - lx)
                            + feat_nchw[b, :, y1_, x1_] * ly * lx
                        )
                res[ri, :, oy, ox] = acc / (ratio_h * ratio_w)
    return res


def test_bbox_predict_nms_prefilter_is_exact():
    """Top-k score prefilter before the rcnn per-class NMS must not change
    the result whenever fewer than nms_pre candidates clear score_thr (the
    realistic regime; nms_pre=0 is the exact-mode fallback)."""
    from rsprompter_tpu.models.roi_heads.bbox_head import (
        bbox_head_predict_single,
    )

    rs = np.random.RandomState(7)
    r, c = 80, 10
    cls_logits = rs.randn(r, c + 1).astype(np.float32) * 3.0
    deltas = (rs.randn(r, c * 4) * 0.1).astype(np.float32)
    proposals = _rand_boxes(rs, r, size=200)
    valid = rs.rand(r) > 0.1
    img_shape = np.asarray([220.0, 220.0], np.float32)
    cfg_exact = dict(score_thr=0.05, nms_iou_thr=0.5, max_per_img=20,
                     nms_pre=0)
    cfg_pre = dict(cfg_exact, nms_pre=256)  # < r*c, forces the prefilter path

    args = (jnp.asarray(cls_logits), jnp.asarray(deltas),
            jnp.asarray(proposals), jnp.asarray(valid),
            jnp.asarray(img_shape), c)
    exact = bbox_head_predict_single(*args, cfg_exact)
    pre = bbox_head_predict_single(*args, cfg_pre)

    # sanity: the prefilter regime actually holds (few enough valid cands)
    n_valid = int(np.sum(
        (np.repeat(valid, c))
        & (jax_softmax_scores(cls_logits)[:, :c].reshape(-1) > 0.05)))
    assert n_valid <= 256

    np.testing.assert_array_equal(np.asarray(exact.valid), np.asarray(pre.valid))
    np.testing.assert_allclose(np.asarray(exact.boxes), np.asarray(pre.boxes))
    np.testing.assert_allclose(np.asarray(exact.scores), np.asarray(pre.scores))
    np.testing.assert_array_equal(np.asarray(exact.labels), np.asarray(pre.labels))


def jax_softmax_scores(cls_logits):
    import jax

    return np.asarray(jax.nn.softmax(jnp.asarray(cls_logits), axis=-1))
