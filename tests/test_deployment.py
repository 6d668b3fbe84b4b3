"""jax.export deployment artifact: serialize -> deserialize -> call parity."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_CFG = os.path.join(REPO, "configs/rsprompter/smoke-nwpu-256.py")


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
