"""Self-parity regression net (VERDICT r4 #10).

Real AP parity against the paper's trained weights is blocked on weights
that don't exist in this environment (PARITY.md "Not yet validated"), so
this pins the next-best thing: the END-TO-END train->eval numerics of the
full 26-component pipeline on real NWPU data. A tiny-but-complete
RSPrompter-anchor (configs/rsprompter/regress-nwpu-128.py: everything
trains, deterministic pipeline, fixed seeds, fp32 CPU) runs 4 epochs through
``tools/train.py`` and the resulting loss trajectory + val COCO metrics are
asserted against the committed golden (tests/golden/regress_nwpu_128.json).
Silent numeric drift anywhere in the gradient/eval chain — the kind unit
tests can't see — moves the trajectory and fails here.

Regenerate after an INTENDED numerics change with
``python scripts/gen_regress_golden.py`` and note the cause in the commit.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_PATH = os.path.join(REPO, "tests", "golden", "regress_nwpu_128.json")

# Noise bands: XLA CPU fp32 is run-to-run deterministic on one box, but the
# golden must survive compiler/version bumps that legally reassociate
# reductions. Losses are O(1-20); mAPs are in [0, 1].
LOSS_RTOL = 5e-3
MAP_ATOL = 5e-3


def run_regression(work_dir):
    """tools/train.py on the regression config, SINGLE-device CPU fp32."""
    env = dict(os.environ)
    # single device: drop the conftest's 8-device virtual platform so the
    # run is the plainest possible jit (also keeps the Hungarian-free anchor
    # family off any multi-device dispatch differences)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env["JAX_PLATFORMS"] = "cpu"
    train_py = os.path.join(REPO, "tools", "train.py")
    argv = [
        train_py,
        os.path.join(REPO, "configs", "rsprompter", "regress-nwpu-128.py"),
        "--work-dir", work_dir,
    ]
    # the axon sitecustomize overrides jax_platforms; force CPU in-process
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        f"sys.argv = {argv!r}\n"
        f"sys.path.insert(0, {REPO!r})\n"
        f"exec(compile(open({train_py!r}).read(), {train_py!r}, 'exec'),\n"
        f"     {{'__name__': '__main__', '__file__': {train_py!r}}})\n"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )


def extract_trajectory(work_dir):
    """metrics.jsonl -> {"losses": [...], "val": {coco/* and val/*: v}}.

    ``val/*`` keys are the runner's prediction digest (num_dets, mean_score,
    mean_mask_prob): numeric fingerprints of the predict->RLE->eval chain
    that move on drift even while the short run's mAP is still 0. Non-finite
    values (mAP_l is NaN when no large-area GTs exist) become None.
    """
    records = [
        json.loads(line)
        for line in open(os.path.join(work_dir, "metrics.jsonl"))
    ]
    losses = [r["loss"] for r in records if "loss" in r and "iter" in r]
    val = {}
    for r in records:
        for k, v in r.items():
            if k.startswith(("coco/", "val/")):
                val[k] = v

    def norm(v):
        v = float(v)
        return round(v, 6) if np.isfinite(v) else None

    assert losses, "no per-iter loss records in metrics.jsonl"
    assert val, "no validation records in metrics.jsonl"
    return {"losses": [round(float(v), 6) for v in losses],
            "val": {k: norm(v) for k, v in val.items()}}


@pytest.mark.slow
def test_regression_trajectory_matches_golden(tmp_path):
    assert os.path.exists(GOLDEN_PATH), (
        "golden missing: run scripts/gen_regress_golden.py and commit "
        "tests/golden/regress_nwpu_128.json"
    )
    golden = json.load(open(GOLDEN_PATH))
    proc = run_regression(str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-4000:]
    traj = extract_trajectory(str(tmp_path))

    assert len(traj["losses"]) == len(golden["losses"]), (
        f"trajectory length changed: {len(traj['losses'])} vs "
        f"{len(golden['losses'])} (schedule/config drift?)"
    )
    np.testing.assert_allclose(
        traj["losses"], golden["losses"], rtol=LOSS_RTOL,
        err_msg="per-iter loss trajectory drifted from the committed golden "
                "(regenerate with scripts/gen_regress_golden.py if intended)",
    )
    assert set(traj["val"]) == set(golden["val"])
    for k, v in golden["val"].items():
        got = traj["val"][k]
        if v is None or got is None:
            assert got == v, f"{k}: {got} vs golden {v} (finiteness changed)"
        elif k == "val/num_dets":
            assert abs(got - v) <= 2, f"{k}: {got} vs golden {v}"
        elif k.startswith("val/"):
            assert abs(got - v) <= 5e-3 * max(1.0, abs(v)), (
                f"{k}: {got} vs golden {v}"
            )
        else:
            assert abs(got - v) <= MAP_ATOL, f"{k}: {got} vs golden {v}"
