"""Robustness benchmark: evaluate under image corruptions, report mPC/rPC.

Behavior parity with the reference ``tools/analysis_tools/test_robustness.py``
+ ``robustness_eval.py`` (COCO-C protocol): run the eval once clean, then per
(corruption, severity), and summarize

  P      clean AP
  mPC    mean AP over corruptions x severities
  rPC    mPC / P (relative robustness)

Each combination runs ``tools/test.py --corruption NAME --severity S`` in a
subprocess (fresh device program per combo). Corruptions come from
``rsprompter_tpu/data/corruptions.py`` (imagecorruptions-parameterized,
noise/blur/digital groups).

Usage:
  python tools/analysis_tools/test_robustness.py CONFIG [CKPT] \
      [--corruptions gaussian_noise jpeg_compression ...] \
      [--severities 1 3 5] [--metric bbox_mAP] [--out robustness.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def parse_args():
    from rsprompter_tpu.data.corruptions import CORRUPTIONS

    p = argparse.ArgumentParser(description="corruption robustness benchmark")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--corruptions", nargs="+", default=list(CORRUPTIONS))
    p.add_argument("--severities", nargs="+", type=int, default=[1, 2, 3, 4, 5])
    p.add_argument("--metric", default="bbox_mAP")
    p.add_argument("--out", default=None, help="write raw results JSON here")
    p.add_argument("--cfg-options", nargs="+", default=None)
    return p.parse_args()


def run_eval(config, checkpoint, metric, corruption=None, severity=1,
             cfg_options=None):
    """One tools/test.py subprocess -> {metric_key: value}."""
    argv = [os.path.join(REPO, "tools", "test.py"), config]
    if checkpoint:
        argv.append(checkpoint)
    if corruption:
        argv += ["--corruption", corruption, "--severity", str(severity)]
    if cfg_options:
        argv += ["--cfg-options"] + list(cfg_options)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the TPU sitecustomize pins the platform programmatically; honor a
        # CPU request by forcing it in-process before jax initializes
        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import sys\n"
            f"sys.argv = {argv!r}\n"
            f"sys.path.insert(0, {REPO!r})\n"
            f"exec(compile(open({argv[0]!r}).read(), {argv[0]!r}, 'exec'),\n"
            f"     {{'__name__': '__main__', '__file__': {argv[0]!r}}})\n"
        )
        cmd = [sys.executable, "-c", code]
    else:
        cmd = [sys.executable] + argv
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"eval failed ({corruption}/{severity}):\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    metrics = {}
    for line in out.stdout.splitlines():
        m = re.match(r"^(coco/\S+): ([-\d.naef]+)$", line.strip())
        if m:
            metrics[m.group(1)] = float(m.group(2))
    key = f"coco/{metric}"
    if key not in metrics:
        raise RuntimeError(f"metric {key} not in output: {sorted(metrics)}")
    return metrics[key]


def main():
    args = parse_args()
    clean = run_eval(args.config, args.checkpoint, args.metric,
                     cfg_options=args.cfg_options)
    print(f"clean {args.metric}: {clean:.4f}", flush=True)
    results = {"clean": clean, "per_corruption": {}}
    for c in args.corruptions:
        per_sev = []
        for s in args.severities:
            ap = run_eval(args.config, args.checkpoint, args.metric,
                          corruption=c, severity=s,
                          cfg_options=args.cfg_options)
            per_sev.append(ap)
            print(f"{c} s{s}: {ap:.4f}", flush=True)
        results["per_corruption"][c] = per_sev
    all_aps = [ap for v in results["per_corruption"].values() for ap in v]
    mpc = float(np.mean(all_aps))
    rpc = mpc / clean if clean > 0 else float("nan")
    results["mPC"] = mpc
    results["rPC"] = rpc
    print(f"P (clean) = {clean:.4f}  mPC = {mpc:.4f}  rPC = {rpc:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
