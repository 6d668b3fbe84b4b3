#!/usr/bin/env python
"""Fetch the HF SAM checkpoints the reference configs point at.

Parity with the reference's ``tools/rsprompter/download_hf_sam_pretrain_ckpt.py``.
Requires network access; in air-gapped environments place
``pytorch_model.bin``/``model.safetensors`` under ``pretrain/sam-vit-{arch}/``
manually — every loader in this repo accepts either format
(``rsprompter_tpu.utils.torch_convert.load_torch_checkpoint``).
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="base", choices=["base", "large", "huge"])
    p.add_argument("--out-dir", default="pretrain")
    args = p.parse_args()
    name = f"facebook/sam-vit-{args.arch}"
    out = os.path.join(args.out_dir, f"sam-vit-{args.arch}")
    os.makedirs(out, exist_ok=True)
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        raise SystemExit("huggingface_hub not available; download manually")
    for fname in ("model.safetensors", "pytorch_model.bin"):
        try:
            path = hf_hub_download(name, fname, local_dir=out)
            print(f"downloaded {path}")
            return
        except Exception as e:  # try next filename
            print(f"{fname}: {e}")
    raise SystemExit("no checkpoint file could be downloaded")


if __name__ == "__main__":
    main()
