"""CLI-codepath multi-device integration: tools/train.py and tools/test.py
sharded over a virtual 8-device CPU mesh (VERDICT r1 item 3 — the mesh must
be reachable from the user-facing CLIs, not just library calls).

Runs the actual CLI entry points in subprocesses (the env must be set before
jax initializes), mirroring how the reference's tools/dist_train.sh exercises
DDP end-to-end.
"""

import json
import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(argv, extra_env=None):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env or {})
    # the axon sitecustomize overrides jax_platforms programmatically; force
    # CPU in-process before the CLI main touches a backend
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        f"sys.argv = {argv!r}\n"
        f"sys.path.insert(0, {REPO!r})\n"
        f"exec(compile(open({argv[0]!r}).read(), {argv[0]!r}, 'exec'),\n"
        f"     {{'__name__': '__main__', '__file__': {argv[0]!r}}})\n"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )


@pytest.mark.slow
def test_train_cli_sharded_8dev():
    with tempfile.TemporaryDirectory() as wd:
        proc = _run_cli(
            [
                os.path.join(REPO, "tools/train.py"),
                os.path.join(REPO, "configs/rsprompter/smoke-nwpu-256.py"),
                "--work-dir", wd,
                "--cfg-options", "max_epochs=1", "val_interval=1",
                "log_interval=1", "train_dataloader.batch_size=1",
                "val_dataloader.batch_size=1",
                "train_dataloader.dataset.indices=16",
                "val_dataloader.dataset.indices=8",
            ]
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        assert "mesh: {'data': 8, 'model': 1}" in proc.stdout, proc.stdout[-2000:]
        log = os.path.join(wd, "metrics.jsonl")
        assert os.path.exists(log)
        records = [json.loads(l) for l in open(log)]
        losses = [r["loss"] for r in records if "loss" in r]
        assert losses and all(abs(v) < 1e6 for v in losses)
        # validation ran sharded and produced coco keys
        assert any("coco/segm_mAP" in r for r in records)
        # checkpoints written
        assert os.path.isdir(os.path.join(wd, "ckpts"))


@pytest.mark.slow
def test_train_cli_sharded_tp_zero():
    """2-way tensor parallel x 4-way data parallel + ZeRO from the CLI."""
    with tempfile.TemporaryDirectory() as wd:
        proc = _run_cli(
            [
                os.path.join(REPO, "tools/train.py"),
                os.path.join(REPO, "configs/rsprompter/smoke-nwpu-256.py"),
                "--work-dir", wd,
                "--cfg-options", "max_epochs=1", "val_interval=5",
                "log_interval=1", "train_dataloader.batch_size=1",
                "train_dataloader.dataset.indices=8",
                "dist.model_parallel=2", "dist.zero=True",
            ]
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        assert "mesh: {'data': 4, 'model': 2}" in proc.stdout, proc.stdout[-2000:]


@pytest.mark.slow
def test_test_cli_sharded_8dev(tmp_path):
    show = str(tmp_path / "overlays")
    proc = _run_cli(
        [
            os.path.join(REPO, "tools/test.py"),
            os.path.join(REPO, "configs/rsprompter/smoke-nwpu-256.py"),
            "--show-dir", show,
            "--cfg-options", "val_dataloader.batch_size=1",
            "val_dataloader.dataset.indices=8",
        ]
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "coco/segm_mAP" in proc.stdout
    # --show-dir wrote rendered overlays (reference tools/test.py:46-55)
    rendered = [f for f in os.listdir(show) if f.endswith(".jpg")]
    assert rendered, "no overlays written by --show-dir"
