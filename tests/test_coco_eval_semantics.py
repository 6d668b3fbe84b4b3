"""pycocotools COCOeval edge-semantics differential tests.

The reference delegates AP to pycocotools (reference
``mmdet/evaluation/metrics/coco_metric.py:346-393`` runs COCOeval), which is
definitionally exact; this framework reimplements it
(``rsprompter_tpu/evaluation/coco_eval.py``). Each test below transcribes one
of the edge rules where reimplementations silently drift, with a
hand-computed expectation derived from pycocotools' ``cocoeval.py``:

  1. crowd GTs match by IoF (det-area denominator) and never block
     re-matching (``evaluateImg``: ``if gtm[tind,gind]>0 and not
     iscrowd[gind]: continue``)
  2. a det whose only above-threshold overlap is an ignored GT matches it
     and is ignored — not a false positive (``dtIg[tind,dind] = gtIg[m]``)
  3. a non-ignored GT is preferred over a HIGHER-IoU ignored one
     (``if m>-1 and gtIg[m]==0 and gtIg[gind]==1: break`` — GTs sorted
     non-ignored first)
  4. score ties keep insertion order (``np.argsort(..., kind='mergesort')``
     in both evaluateImg and accumulate)
  5. segm det areas for the unmatched-out-of-range ignore rule come from the
     RLE area, not the bbox (loadRes: ``ann['area'] =
     maskUtils.area(ann['segmentation'])``)
  6. maxDets truncates the score-sorted per-(image, category) det list
     BEFORE matching (``dt = dt[0:maxDet]``)
  7. the 101-point interpolation maps recall thresholds with
     ``np.searchsorted(rc, recThrs, side='left')`` — the boundary recall
     value itself takes the precision AT that recall
"""

import numpy as np

from rsprompter_tpu.evaluation.coco_eval import CocoEvaluator
from rsprompter_tpu.evaluation.rle import encode_masks


def _dets(rows):
    """rows: [(score, x1,y1,x2,y2), ...] -> det dict, single class."""
    rows = np.asarray(rows, np.float64).reshape(-1, 5)
    return dict(
        bboxes=rows[:, 1:], scores=rows[:, 0],
        labels=np.zeros(len(rows), np.int64),
    )


def _gts(rows, iscrowd=None, areas=None):
    rows = np.asarray(rows, np.float64).reshape(-1, 4)
    g = dict(bboxes=rows, labels=np.zeros(len(rows), np.int64))
    if iscrowd is not None:
        g["iscrowd"] = np.asarray(iscrowd, bool)
    if areas is not None:
        g["areas"] = np.asarray(areas, np.float64)
    return g


def test_crowd_iof_match_not_fp():
    """A det inside a crowd region matches the crowd by IoF and is ignored
    (neither TP nor FP); the crowd never steals the real GT's det."""
    ev = CocoEvaluator(num_classes=1)
    ev.add_image(
        _dets([(0.9, 0, 0, 10, 10),      # exact match on the real GT
               (0.8, 22, 22, 30, 30)]),  # IoU vs crowd = 64/400, IoF = 1.0
        _gts([(0, 0, 10, 10), (20, 20, 40, 40)], iscrowd=[False, True]),
    )
    s = ev.summarize()
    # crowd is always ignored -> npig=1; det1 crowd-matched-ignored -> no FP
    assert s["bbox_mAP"] == 1.0
    assert s["bbox_mAP_50"] == 1.0


def test_crowd_can_rematch_multiple_dets():
    """An already-matched crowd GT keeps absorbing dets (the ``continue``
    guard skips only matched NON-crowd GTs)."""
    ev = CocoEvaluator(num_classes=1)
    ev.add_image(
        _dets([(0.9, 20, 20, 30, 30),   # inside crowd, IoF 1.0
               (0.8, 30, 30, 40, 40),   # inside crowd too, after it matched
               (0.7, 0, 0, 10, 10)]),   # the real TP
        _gts([(0, 0, 10, 10), (20, 20, 40, 40)], iscrowd=[False, True]),
    )
    # if crowd re-matching were blocked, det1 would be an FP ranked above
    # the TP and AP would drop to ~0.5
    assert ev.summarize()["bbox_mAP"] == 1.0


def test_ignored_gt_preferred_over_unmatched():
    """A det whose only overlap is an area-range-ignored GT matches it and
    is ignored for that range instead of counting as FP."""
    ev = CocoEvaluator(num_classes=1)
    ev.add_image(
        _dets([(0.9, 100, 100, 150, 150),  # matches the medium GT
               (0.8, 0, 0, 50, 50)]),      # only overlaps the small GT
        _gts(
            [(0, 0, 50, 50), (100, 100, 150, 150)],
            areas=[10.0, 2500.0],  # annotation areas: small / medium
        ),
    )
    s = ev.summarize()
    # medium range: small GT ignored; det1 matches it -> ignored, no FP
    assert s["bbox_mAP_m"] == 1.0
    # small range: medium GT ignored; det0 matches it -> ignored, no FP
    assert s["bbox_mAP_s"] == 1.0
    assert s["bbox_mAP"] == 1.0


def test_nonignored_beats_higher_iou_ignored():
    """GTs are sorted non-ignored first and the scan BREAKS once an m>-1
    non-ignored match would be displaced by an ignored GT — so a det takes
    the non-ignored GT even when an ignored (crowd) GT has higher IoU."""
    ev = CocoEvaluator(num_classes=1)
    # det IoU vs GT0 = 100/121 ~ 0.826; IoF vs the crowd = 1.0
    ev.add_image(
        _dets([(0.9, 0, 0, 11, 11)]),
        _gts([(0, 0, 10, 10), (0, 0, 12, 12)], iscrowd=[False, True]),
    )
    s = ev.summarize()
    # thresholds .5...8 (7 of 10): TP on GT0 -> AP 1; .85...95: GT0 below
    # threshold, det falls into the crowd -> ignored -> recall 0 -> AP 0
    assert s["bbox_mAP_50"] == 1.0
    assert abs(s["bbox_mAP"] - 0.7) < 1e-6


def test_score_tie_keeps_insertion_order():
    """mergesort stability: equal-score dets keep their per-image order.
    [FP, TP] at the same score -> pr=[0,.5] enveloped to [.5,.5] ->
    AP = 51/101 * 0.5 (unstable ordering would give 51/101)."""
    ev = CocoEvaluator(num_classes=1)
    ev.add_image(
        _dets([(0.5, 50, 50, 60, 60),   # FP, listed first
               (0.5, 0, 0, 10, 10)]),   # TP, same score
        _gts([(0, 0, 10, 10), (20, 20, 30, 30)]),
    )
    want = round(51 * 0.5 / 101, 4)
    assert ev.summarize()["bbox_mAP"] == want


def test_segm_det_area_from_rle_not_bbox():
    """segm unmatched-det out-of-range ignore uses RLE area. det1's mask is
    500 px spread over a much larger bbox: in the SMALL range its RLE area
    (500 < 32^2) keeps it a counted FP; bbox area (~1600) would wrongly
    ignore it and inflate AP to 1.0."""
    ev = CocoEvaluator(num_classes=1, iou_type="segm")
    h = w = 100
    gt_mask = np.zeros((h, w), np.uint8)
    gt_mask[0:10, 0:10] = 1  # area 100 (small)
    det_tp = gt_mask.copy()
    det_fp = np.zeros((h, w), np.uint8)
    det_fp[50:60, 50:75] = 1   # 250 px
    det_fp[80:90, 10:35] = 1   # 250 px -> RLE area 500, bbox 40x65 = 2600
    ev.add_image(
        dict(
            bboxes=np.array([[0, 0, 10, 10], [10, 50, 75, 90]], np.float64),
            scores=np.array([0.9, 0.95]),  # FP outranks the TP
            labels=np.zeros(2, np.int64),
            masks=encode_masks(np.stack([det_tp, det_fp])),
        ),
        dict(
            bboxes=np.array([[0, 0, 10, 10]], np.float64),
            labels=np.zeros(1, np.int64),
            areas=np.array([100.0]),
            masks=encode_masks(gt_mask[None]),
        ),
    )
    s = ev.summarize()
    # small range: order [FP, TP] -> pr=[0,.5] -> envelope .5 -> AP .5
    assert s["segm_mAP_s"] == 0.5
    assert s["segm_mAP"] == 0.5
    assert np.isnan(s["segm_mAP_m"])  # no medium GT anywhere


def test_maxdets_truncates_before_matching():
    """With maxDets=1, the score-sorted det list is cut BEFORE matching, so
    a lower-scored would-be TP is simply gone: recall 0, AP 0."""
    ev = CocoEvaluator(num_classes=1, max_dets=1)
    ev.add_image(
        _dets([(0.9, 50, 50, 60, 60),   # kept: FP
               (0.5, 0, 0, 10, 10)]),   # truncated away: would be TP
        _gts([(0, 0, 10, 10)]),
    )
    assert ev.summarize()["bbox_mAP"] == 0.0


def test_101_point_left_boundary():
    """rc=[0.5] with pr=[1]: searchsorted side='left' maps every recall
    threshold <= 0.5 (51 of the 101 points, INCLUDING 0.5 itself) to that
    precision -> AP = 51/101. side='right' would give 50/101."""
    ev = CocoEvaluator(num_classes=1)
    ev.add_image(
        _dets([(0.9, 0, 0, 10, 10)]),
        _gts([(0, 0, 10, 10), (20, 20, 30, 30)]),
    )
    want = round(51 / 101, 4)
    s = ev.summarize()
    assert s["bbox_mAP"] == want
    assert s["bbox_mAP_50"] == want


def test_gt_area_from_annotation_not_bbox():
    """GT area-range ignore reads the annotation 'area' (segmentation area),
    not the bbox: a GT with a big bbox but small annotation area counts as
    SMALL (gt_from_raw_sample + cocoeval _prepare semantics)."""
    from rsprompter_tpu.evaluation.coco_metric import gt_from_raw_sample

    raw = dict(
        gt_bboxes=np.array([[0, 0, 80, 80]], np.float32),  # bbox area 6400
        gt_labels=np.zeros(1, np.int64),
        gt_ignore_flags=np.zeros(1, bool),
        gt_areas=np.array([400.0]),  # annotation (segmentation) area: small
        gt_masks=np.zeros((1, 100, 100), np.uint8),
    )
    gt = gt_from_raw_sample(raw)
    ev = CocoEvaluator(num_classes=1)
    ev.add_image(_dets([(0.9, 0, 0, 80, 80)]), gt)
    s = ev.summarize()
    assert s["bbox_mAP_s"] == 1.0       # counted in the small range
    assert np.isnan(s["bbox_mAP_m"])    # NOT counted as medium
