"""Low-level python API: init_detector / inference_detector.

Behavior parity: reference ``mmdet/apis/inference.py:26`` — the two-call
workflow (build+load once, infer many). Thin wrappers over ``DetInferencer``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from rsprompter_tpu.apis.inferencer import DetInferencer


def init_detector(
    config: Union[str, dict],
    checkpoint: Optional[str] = None,
    **kwargs,
) -> DetInferencer:
    """Build a ready-to-run detector from a config path and checkpoint."""
    return DetInferencer(config, weights=checkpoint, **kwargs)


def inference_detector(
    model: DetInferencer,
    imgs: Union[str, np.ndarray, Sequence],
    **kwargs,
):
    """Run inference; returns the per-image prediction dicts."""
    return model(imgs, **kwargs)["predictions"]
