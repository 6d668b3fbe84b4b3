#!/usr/bin/env python
"""Single/batch image inference demo.

CLI parity with the reference's ``demo/image_demo.py``:
  python tools/image_demo.py IMG CONFIG [--weights CKPT] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rsprompter_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    p = argparse.ArgumentParser(description="Image demo")
    p.add_argument("img", help="image path (or directory)")
    p.add_argument("config")
    p.add_argument("--weights", default=None)
    p.add_argument("--out-dir", default="outputs")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    from rsprompter_tpu.apis.inferencer import DetInferencer

    inputs = args.img
    if os.path.isdir(inputs):
        inputs = [
            os.path.join(inputs, f)
            for f in sorted(os.listdir(inputs))
            if f.lower().endswith((".jpg", ".png", ".jpeg", ".tif"))
        ]
    inf = DetInferencer(args.config, weights=args.weights)
    out = inf(inputs, out_dir=args.out_dir, score_thr=args.score_thr)
    n = sum(len(p["scores"]) for p in out["predictions"])
    print(f"{len(out['predictions'])} image(s), {n} detections -> {args.out_dir}")


if __name__ == "__main__":
    main()
