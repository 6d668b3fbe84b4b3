"""jax.export deployment artifact: serialize -> deserialize -> call parity."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_CFG = os.path.join(REPO, "configs/rsprompter/smoke-nwpu-256.py")


@pytest.mark.slow
def test_inferencer_runs_exported_artifact(tmp_path):
    """DetInferencer(exported=...) must reproduce the normal inferencer's
    predictions on a real image (the serve-from-artifact path)."""
    sys.path.insert(0, os.path.join(REPO, "tools", "deployment"))
    from export_model import build_exported

    from rsprompter_tpu.apis.inferencer import DetInferencer
    from rsprompter_tpu.core.config import Config

    img = "/root/reference/data/NWPU/imgs/003.jpg"
    if not os.path.exists(img):
        pytest.skip("NWPU data unavailable")
    cfg = Config.fromfile(SMOKE_CFG)
    exp, _, _ = build_exported(cfg, batch_size=1, embed_weights=False)
    path = tmp_path / "m.jaxexp"
    path.write_bytes(exp.serialize())

    normal = DetInferencer(Config.fromfile(SMOKE_CFG), batch_size=1)
    viaexp = DetInferencer(
        Config.fromfile(SMOKE_CFG), batch_size=1, exported=str(path)
    )
    a = normal([img], return_masks=True, score_thr=0.3)["predictions"][0]
    b = viaexp([img], return_masks=True, score_thr=0.3)["predictions"][0]
    assert len(a["scores"]) == len(b["scores"])
    np.testing.assert_allclose(a["scores"], b["scores"], atol=1e-4)
    np.testing.assert_allclose(a["bboxes"], b["bboxes"], atol=1e-2)
    if a["scores"]:
        assert (a["masks"] == b["masks"]).mean() > 0.999


@pytest.mark.slow
def test_export_roundtrip_program_only(tmp_path):
    import jax
    import jax.export

    sys.path.insert(0, os.path.join(REPO, "tools", "deployment"))
    from export_model import _flat_predict, build_exported

    from rsprompter_tpu.apis.build import build_detector
    from rsprompter_tpu.core.config import Config

    cfg = Config.fromfile(SMOKE_CFG)
    exp, batch, variables = build_exported(cfg, embed_weights=False)
    blob = exp.serialize()
    assert len(blob) < 50e6  # program-only: no weights baked in

    exp2 = jax.export.deserialize(bytearray(blob))
    out = exp2.call(variables, batch)

    model = build_detector(cfg.model)
    ref = jax.jit(_flat_predict(model))(variables, batch)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32), np.asarray(ref[k], np.float32),
            atol=1e-2 if k == "boxes" else 1e-4, err_msg=k,
        )
    # uint8 mask probs may differ by one quantization level across compiles
    assert np.max(np.abs(
        np.asarray(out["mask_probs_u8"], np.int16)
        - np.asarray(ref["mask_probs_u8"], np.int16)
    )) <= 1
