"""Print the fully-resolved config (after _base_ inheritance and
--cfg-options overrides) — reference ``tools/misc/print_config.py``.

Usage:
  python tools/misc/print_config.py CONFIG [--cfg-options k=v ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def main():
    p = argparse.ArgumentParser(description="print the resolved config")
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None)
    args = p.parse_args()

    from rsprompter_tpu.core.config import Config

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    print(json.dumps(dict(cfg), indent=2, default=repr))


if __name__ == "__main__":
    main()
