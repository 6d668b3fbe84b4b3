"""Integration test for the AP-parity runbook (tools/rsprompter/verify_parity.sh).

No real reference checkpoints exist in this environment, so the runbook is
driven end to end on the smoke config with a synthetic mmengine-style ``.pth``
holding a 1024-native ``pos_embed`` — which also exercises the load-time
positional resize (vit_sam.py:576-588 rule) through the CLI: the 256-input
smoke model must accept the (1,64,64,768) table and produce an eval table row.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_verify_parity_runbook_smoke(tmp_path):
    import torch

    pretrain = tmp_path / "pretrain"
    pretrain.mkdir()
    # mmengine-style checkpoint: reference naming (backbone.vision_encoder.*),
    # 1024-native pos-embed grid (64x64) into the 256-input model (16x16)
    sd = {
        "backbone.vision_encoder.pos_embed": torch.from_numpy(
            np.random.RandomState(0).randn(1, 64, 64, 768).astype(np.float32)
        )
    }
    torch.save({"state_dict": sd}, pretrain / "smoke-nwpu-256.pth")
    (pretrain / "expected_ap.json").write_text(
        '{"smoke-nwpu-256": {"bbox_mAP": 0.0}}'
    )

    env = dict(
        os.environ,
        PARITY_CONFIGS="smoke-nwpu-256",
        PRETRAIN_DIR=str(pretrain),
        RSPROMPTER_PLATFORM="cpu",
    )
    proc = subprocess.run(
        ["bash", "tools/rsprompter/verify_parity.sh", "--quick"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    table = open(os.path.join(REPO, "work_dirs/parity/parity_table.txt")).read()
    row = [l for l in table.splitlines() if l.startswith("smoke-nwpu-256")]
    assert row, table
    cols = row[0].split()
    float(cols[1])  # bbox_mAP parsed as a number (not FAIL/-)
    float(cols[2])  # segm_mAP
    # the expected_ap diff section ran
    assert "parity band" in proc.stdout, proc.stdout[-1500:]
