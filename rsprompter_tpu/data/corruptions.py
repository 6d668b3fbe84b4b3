"""Image corruptions for robustness benchmarking (host-side numpy/cv2).

Behavior parity with the corruption set used by the reference's
``tools/analysis_tools/test_robustness.py`` (the ``imagecorruptions``
package), re-implemented with numpy/cv2 so no extra dependency is needed.
Ten corruptions across the noise / blur / digital groups with the standard
severity-1..5 parameterizations; the weather group (snow/frost/fog) needs
texture assets the package ships and is intentionally out of scope.

All functions take/return HWC BGR uint8-range float32 or uint8 arrays and
preserve shape and dtype scale ([0, 255]).
"""

from __future__ import annotations

import numpy as np

# severity-indexed parameters (index 0 = severity 1), following the public
# imagecorruptions tables
_PARAMS = {
    "gaussian_noise": [0.08, 0.12, 0.18, 0.26, 0.38],  # sigma on [0,1]
    "shot_noise": [60, 25, 12, 5, 3],  # poisson lambda scale
    "impulse_noise": [0.03, 0.06, 0.09, 0.17, 0.27],  # salt&pepper amount
    "defocus_blur": [3, 4, 6, 8, 10],  # disk radius
    "motion_blur": [9, 11, 13, 15, 19],  # line kernel length
    "zoom_blur": [1.11, 1.16, 1.21, 1.26, 1.31],  # max zoom
    "brightness": [0.1, 0.2, 0.3, 0.4, 0.5],  # additive on [0,1]
    "contrast": [0.4, 0.3, 0.2, 0.1, 0.05],  # scale toward the mean
    "pixelate": [0.6, 0.5, 0.4, 0.3, 0.25],  # downscale factor
    "jpeg_compression": [25, 18, 15, 10, 7],  # jpeg quality
}

CORRUPTIONS = tuple(_PARAMS)


def _rng(seed):
    return np.random.RandomState(0 if seed is None else seed)


def corrupt(
    img: np.ndarray, name: str, severity: int = 1, seed: int | None = None
) -> np.ndarray:
    """Apply ``name`` at ``severity`` (1..5). Deterministic given ``seed``."""
    import cv2

    assert name in _PARAMS, f"unknown corruption {name!r} (have {CORRUPTIONS})"
    assert 1 <= severity <= 5, severity
    p = _PARAMS[name][severity - 1]
    dtype = img.dtype
    x = img.astype(np.float32) / 255.0
    rs = _rng(seed)

    if name == "gaussian_noise":
        x = x + rs.normal(0, p, x.shape).astype(np.float32)
    elif name == "shot_noise":
        x = rs.poisson(np.clip(x, 0, 1) * p).astype(np.float32) / p
    elif name == "impulse_noise":
        mask = rs.rand(*x.shape[:2])
        x[mask < p / 2] = 0.0
        x[mask > 1 - p / 2] = 1.0
    elif name == "defocus_blur":
        r = int(p)
        yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
        k = ((yy ** 2 + xx ** 2) <= r ** 2).astype(np.float32)
        k /= k.sum()
        x = cv2.filter2D(x, -1, k)
    elif name == "motion_blur":
        k = np.zeros((int(p), int(p)), np.float32)
        k[int(p) // 2, :] = 1.0 / p
        c, s = np.cos(np.deg2rad(25)), np.sin(np.deg2rad(25))
        m = np.float32([[c, -s, p / 2 * (1 - c + s)], [s, c, p / 2 * (1 - s - c)]])
        k = cv2.warpAffine(k, m, k.shape[::-1])
        ksum = k.sum()
        if ksum > 0:
            k /= ksum
        x = cv2.filter2D(x, -1, k)
    elif name == "zoom_blur":
        h, w = x.shape[:2]
        acc = np.zeros_like(x)
        zooms = np.arange(1.0, p, 0.02)
        for z in zooms:
            zh, zw = int(np.ceil(h / z)), int(np.ceil(w / z))
            y0, x0 = (h - zh) // 2, (w - zw) // 2
            crop = x[y0 : y0 + zh, x0 : x0 + zw]
            acc += cv2.resize(crop, (w, h))
        x = acc / len(zooms)
    elif name == "brightness":
        x = x + p
    elif name == "contrast":
        mean = x.mean(axis=(0, 1), keepdims=True)
        x = (x - mean) * p + mean
    elif name == "pixelate":
        h, w = x.shape[:2]
        small = cv2.resize(
            x, (max(1, int(w * p)), max(1, int(h * p))),
            interpolation=cv2.INTER_AREA,
        )
        x = cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)
    elif name == "jpeg_compression":
        u8 = (np.clip(x, 0, 1) * 255).astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", u8, [int(cv2.IMWRITE_JPEG_QUALITY), int(p)])
        assert ok
        x = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32) / 255.0

    out = np.clip(x, 0, 1) * 255.0
    return out.astype(dtype) if np.issubdtype(dtype, np.integer) else out


class CorruptImage:
    """Pipeline transform: corrupt ``sample['img']`` before any resizing
    (the reference applies corruptions at load time, pre-pipeline)."""

    def __init__(self, name: str, severity: int = 1, seed: int | None = 0):
        self.name = name
        self.severity = severity
        self.seed = seed

    def __call__(self, sample):
        sample["img"] = corrupt(
            sample["img"], self.name, self.severity,
            # per-image determinism: hash the id so images differ but reruns
            # reproduce
            seed=(self.seed or 0) + int(sample.get("img_id", 0)),
        )
        return sample
