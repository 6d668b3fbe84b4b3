"""The driver's multi-chip contract, as a test: ``dryrun_multichip(8)`` must
run BOTH detector families' sharded paths on a virtual 8-device mesh —
the anchor family's full DP4xTP2+ZeRO train step, and the query family's
train step (Hungarian matching via ``jax.pure_callback`` on the CPU
platform, under the sharded jit) + sharded predict, with the sharded query
loss asserted equal to the single-device value inside the dryrun itself.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_both_families():
    # dryrun_multichip self-bootstraps the 8-virtual-CPU-device subprocess;
    # run it from a clean child so this process's jax config is untouched
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK (anchor)" in proc.stdout, proc.stdout[-2000:]
    assert "dryrun_multichip OK (query)" in proc.stdout, proc.stdout[-2000:]
