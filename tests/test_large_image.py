"""Sliced large-image inference: tiling, shifting, NMS merge."""

import numpy as np

from rsprompter_tpu.utils.large_image import (
    merge_patch_predictions,
    nms_np,
    paste_scene_masks,
    slice_offsets,
)


def test_slice_offsets_cover_and_are_uniform():
    h, w, patch = 700, 900, 256
    offs = slice_offsets(h, w, patch, overlap=0.25)
    # full coverage: every pixel inside some tile
    cov = np.zeros((h, w), bool)
    for x0, y0 in offs:
        assert 0 <= x0 <= w - patch and 0 <= y0 <= h - patch
        cov[y0 : y0 + patch, x0 : x0 + patch] = True
    assert cov.all()
    # small image -> single tile at origin
    assert slice_offsets(100, 100, 256) == [(0, 0)]


def test_nms_np_suppresses_duplicates():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_np(boxes, scores, iou_thr=0.5)
    assert list(keep) == [0, 2]


def test_merge_shifts_and_dedups_across_overlap():
    """The same object seen by two overlapping tiles must merge to ONE
    detection at correct scene coordinates, with its mask pasted there."""
    patch = 100
    offsets = [(0, 0), (60, 0)]
    # object at scene x=[70, 90], y=[10, 30]: tile0 sees it at x=[70,90],
    # tile1 at x=[10,30]
    m0 = np.zeros((1, patch, patch), bool)
    m0[0, 10:30, 70:90] = True
    m1 = np.zeros((1, patch, patch), bool)
    m1[0, 10:30, 10:30] = True
    preds = [
        dict(bboxes=[[70, 10, 90, 30]], scores=[0.8], labels=[0], masks=m0),
        dict(bboxes=[[10, 10, 30, 30]], scores=[0.9], labels=[0], masks=m1),
    ]
    out = merge_patch_predictions(preds, offsets, (100, 160), iou_thr=0.5)
    assert len(out["scores"]) == 1
    assert out["scores"][0] == 0.9  # higher-scored duplicate wins
    np.testing.assert_allclose(out["bboxes"][0], [70, 10, 90, 30])
    scene_masks = list(paste_scene_masks(out["masks"], (100, 160)))
    assert scene_masks[0].shape == (100, 160)
    ys, xs = np.nonzero(scene_masks[0])
    assert xs.min() == 70 and xs.max() == 89 and ys.min() == 10

    # different classes never merge
    preds[1]["labels"] = [1]
    out2 = merge_patch_predictions(preds, offsets, (100, 160), iou_thr=0.5)
    assert len(out2["scores"]) == 2


def test_merge_with_partial_masks_stays_aligned():
    """Only some patches carrying masks must not misalign mask<->detection
    pairing (review finding): the maskless patch's detection keeps None."""
    patch = 100
    offsets = [(0, 0), (200, 0)]
    m1 = np.zeros((1, patch, patch), bool)
    m1[0, 5:15, 5:15] = True
    preds = [
        dict(bboxes=[[10, 10, 30, 30]], scores=[0.8], labels=[0]),  # no masks
        dict(bboxes=[[5, 5, 15, 15]], scores=[0.9], labels=[0], masks=m1),
    ]
    out = merge_patch_predictions(preds, offsets, (100, 320), iou_thr=0.5)
    assert len(out["scores"]) == 2
    i_lo = int(np.argmin(out["scores"]))  # the maskless 0.8 detection
    i_hi = int(np.argmax(out["scores"]))
    assert out["masks"][i_lo] is None
    masked = out["masks"][i_hi]
    assert masked is not None and masked[1] == (200, 0)
    scene = list(paste_scene_masks(out["masks"], (100, 320)))
    assert scene[i_lo].sum() == 0
    ys, xs = np.nonzero(scene[i_hi])
    assert xs.min() == 205 and ys.min() == 5
