"""Corruption library (robustness benchmark data path)."""

import numpy as np
import pytest

from rsprompter_tpu.data.corruptions import CORRUPTIONS, CorruptImage, corrupt


def _img():
    rs = np.random.RandomState(0)
    return (rs.rand(64, 48, 3) * 255).astype(np.float32)


@pytest.mark.parametrize("name", CORRUPTIONS)
def test_corrupt_shape_range_determinism(name):
    img = _img()
    out = corrupt(img, name, severity=3, seed=1)
    assert out.shape == img.shape and out.dtype == img.dtype
    assert out.min() >= 0.0 and out.max() <= 255.0
    again = corrupt(img, name, severity=3, seed=1)
    np.testing.assert_array_equal(out, again)
    # it actually corrupts
    assert np.abs(out - img).mean() > 0.5, name


@pytest.mark.parametrize("name", ["gaussian_noise", "pixelate", "contrast"])
def test_severity_monotone_distortion(name):
    img = _img()
    errs = [
        np.abs(corrupt(img, name, severity=s, seed=1) - img).mean()
        for s in (1, 3, 5)
    ]
    assert errs[0] < errs[1] < errs[2], (name, errs)


def test_uint8_roundtrip_and_transform():
    img = _img().astype(np.uint8)
    out = corrupt(img, "jpeg_compression", severity=5)
    assert out.dtype == np.uint8
    t = CorruptImage("gaussian_noise", severity=2)
    s1 = t({"img": _img(), "img_id": 7})
    s2 = t({"img": _img(), "img_id": 8})
    # per-image seeds differ, reruns reproduce
    assert not np.array_equal(s1["img"], s2["img"])
    np.testing.assert_array_equal(
        s1["img"], CorruptImage("gaussian_noise", 2)({"img": _img(), "img_id": 7})["img"]
    )


def test_unknown_corruption_rejected():
    with pytest.raises(AssertionError):
        corrupt(_img(), "snow", 1)
