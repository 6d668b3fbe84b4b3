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
