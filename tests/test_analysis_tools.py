"""analyze_logs + browse_dataset CLIs (reference tools/analysis_tools)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_CFG = os.path.join(REPO, "configs/rsprompter/smoke-nwpu-256.py")


def _write_log(path):
    lines = [
        {"epoch": 0, "iter": 2, "loss": 2.0, "it_per_s": 0.1, "lr": 1e-4},
        {"epoch": 0, "iter": 4, "loss": 1.5, "it_per_s": 2.0, "lr": 1e-4},
        {"epoch": 0, "coco/bbox_mAP": 0.1},
        {"epoch": 1, "iter": 2, "loss": 1.0, "it_per_s": 2.0, "lr": 1e-4},
        {"epoch": 1, "iter": 4, "loss": 0.5, "it_per_s": 2.5, "lr": 1e-4},
        {"epoch": 1, "coco/bbox_mAP": 0.3},
    ]
    with open(path, "w") as f:
        for r in lines:
            f.write(json.dumps(r) + "\n")


def test_series_for_key(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools", "analysis_tools"))
    import analyze_logs

    log = tmp_path / "metrics.jsonl"
    _write_log(log)
    records = analyze_logs.load_log(str(log))
    x, y = analyze_logs.series_for_key(records, "loss")
    assert list(y) == [2.0, 1.5, 1.0, 0.5]
    assert x[1] == 1.0 and x[3] == 2.0  # end-of-epoch coordinates
    x, y = analyze_logs.series_for_key(records, "coco/bbox_mAP")
    assert list(y) == [0.1, 0.3] and list(x) == [1.0, 2.0]


def test_analyze_logs_cli(tmp_path):
    log = tmp_path / "metrics.jsonl"
    _write_log(log)
    script = os.path.join(REPO, "tools", "analysis_tools", "analyze_logs.py")
    out = subprocess.run(
        [sys.executable, script, "cal_train_time", str(log)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    # each epoch drops its warmup record: epoch0 -> 0.5, epoch1 -> 0.4
    assert "average iter time: 0.4500 s/iter" in out.stdout
    png = tmp_path / "c.png"
    out = subprocess.run(
        [sys.executable, script, "plot_curve", str(log),
         "--keys", "loss", "coco/bbox_mAP", "--out", str(png)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr


def test_analyze_results_cli(tmp_path):
    """Dump -> per-image AP ranking -> rendered good/bad overlays."""
    import cv2
    import numpy as np

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_mask_eval_path import _make_case

    from rsprompter_tpu.evaluation.coco_metric import CocoMetric

    meta, gts, dets, probs = _make_case(200, 160, 256, 64)
    img_path = str(tmp_path / "img.jpg")
    cv2.imwrite(img_path, np.full((200, 160, 3), 128, np.uint8))
    meta["img_path"] = img_path
    dump = tmp_path / "results.json"
    metric = CocoMetric(num_classes=1, dump_path=str(dump))
    metric.process([meta], dets, probs, [gts])
    metric.compute()

    script = os.path.join(REPO, "tools", "analysis_tools", "analyze_results.py")
    out = subprocess.run(
        [sys.executable, script, str(dump), "--out-dir", str(tmp_path / "a"),
         "--topk", "1"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    good = os.listdir(tmp_path / "a" / "good")
    bad = os.listdir(tmp_path / "a" / "bad")
    # one perfect-AP image: shows up in both ranks with its AP in the name
    assert good and bad and "_1.000" in good[0], (good, bad)


def test_kmeans_anchors_recovers_clusters():
    """Two well-separated box shapes -> the two k-means anchors match them
    and coverage is ~1."""
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tools", "analysis_tools"))
    from optimize_anchors import kmeans_anchors

    rs = np.random.RandomState(0)
    wh = np.concatenate([
        np.array([20.0, 40.0]) + rs.randn(50, 2),
        np.array([100.0, 60.0]) + rs.randn(50, 2),
    ])
    anchors, miou = kmeans_anchors(wh, 2, seed=1)
    assert miou > 0.95
    assert np.allclose(anchors[0], [20, 40], atol=2)
    assert np.allclose(anchors[1], [100, 60], atol=2)


def test_optimize_anchors_cli():
    script = os.path.join(REPO, "tools", "analysis_tools", "optimize_anchors.py")
    out = subprocess.run(
        [sys.executable, script, SMOKE_CFG, "--k", "3"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "mean best-IoU coverage" in out.stdout


def test_coco_error_analysis_waterfall(tmp_path):
    """A loc-imprecise TP + a higher-scored class-confusion FP: the waterfall
    must attribute the losses to the right stages (C75=0 < C50=Loc~0.5 <
    Oth=BG=FN=1)."""
    sys.path.insert(0, os.path.join(REPO, "tools", "analysis_tools"))
    from coco_error_analysis import analyze_dump

    dump = {
        "num_classes": 2,
        "metrics": ["bbox"],
        "images": [{
            "det": {
                # [0]: confusion FP (exactly on the class-1 GT, labeled 0)
                # [1]: class-0 TP at IoU ~0.68 (matches @.5, misses @.75)
                "bboxes": [[100, 100, 140, 140], [4, 4, 44, 44]],
                "scores": [0.9, 0.8],
                "labels": [0, 0],
            },
            "gt": {
                "bboxes": [[0, 0, 40, 40], [100, 100, 140, 140]],
                "labels": [0, 1],
                "iscrowd": [False, False],
                "areas": [1600.0, 1600.0],
            },
        }],
    }
    path = tmp_path / "d.json"
    path.write_text(json.dumps(dump))
    out = analyze_dump(str(path), "bbox")
    row = out[0]
    assert row["C75"] == 0.0
    assert 0.4 < row["C50"] <= 0.6
    assert row["Loc"] == row["C50"]  # the FP is a confusion, not a loc error
    assert row["Oth"] == 1.0  # forgiving class confusion recovers full AP
    assert row["BG"] == 1.0 and row["FN"] == 1.0


def test_weighted_boxes_fusion_recovers_gt(tmp_path):
    """Two models with opposite localization bias: WBF's score-weighted
    average must land nearer the GT than either input, and the fused dump
    must evaluate above both."""
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tools", "analysis_tools"))
    from eval_metric import evaluate_dump
    from fuse_results import fuse_dumps, weighted_boxes_fusion

    gt_box = [40.0, 40.0, 80.0, 80.0]
    shift = 4.0  # IoU of the two inputs = 0.67 > the 0.55 cluster thr
    b, s, l = weighted_boxes_fusion(
        [[[40 - shift, 40, 80 - shift, 80]], [[40 + shift, 40, 80 + shift, 80]]],
        [[0.8], [0.8]], [[0], [0]],
    )
    assert len(b) == 1 and np.allclose(b[0], gt_box, atol=1e-6)
    assert s[0] == 0.8  # both models voted -> no score penalty

    def dump_for(offset):
        return {
            "num_classes": 1, "metrics": ["bbox"],
            "images": [{
                "det": {"bboxes": [[40 + offset, 40, 80 + offset, 80]],
                        "scores": [0.8], "labels": [0]},
                "gt": {"bboxes": [gt_box], "labels": [0],
                       "iscrowd": [False], "areas": [1600.0]},
            }],
        }

    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(dump_for(-shift)))
    pb.write_text(json.dumps(dump_for(+shift)))
    fused = fuse_dumps([str(pa), str(pb)])
    pf = tmp_path / "f.json"
    pf.write_text(json.dumps(fused))
    ap_a = evaluate_dump(str(pa))["coco/bbox_mAP"]
    ap_f = evaluate_dump(str(pf))["coco/bbox_mAP"]
    assert ap_f > ap_a
    assert ap_f == 1.0  # perfectly recovered box


def test_browse_dataset_cli(tmp_path):
    script = os.path.join(REPO, "tools", "analysis_tools", "browse_dataset.py")
    out = subprocess.run(
        [sys.executable, script, SMOKE_CFG, "--output-dir", str(tmp_path),
         "--phase", "val", "--max-samples", "2"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    written = [f for f in os.listdir(tmp_path) if f.endswith(".jpg")]
    assert written, out.stdout
