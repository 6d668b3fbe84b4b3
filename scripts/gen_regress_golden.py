"""(Re)generate the self-parity golden trajectory
(tests/golden/regress_nwpu_128.json) by running the regression config's
train->val loop on the CPU platform, exactly as tests/test_regression_net.py
replays it. Run after any INTENDED numerics change, commit the new golden,
and note the cause in the commit message.

Usage: python scripts/gen_regress_golden.py
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_regression_net import GOLDEN_PATH, extract_trajectory, run_regression  # noqa: E402


def main():
    with tempfile.TemporaryDirectory() as wd:
        proc = run_regression(wd)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(proc.returncode)
        traj = extract_trajectory(wd)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(traj, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")
    print(json.dumps(traj, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
