"""Trained-reference-checkpoint loading: synthetic roundtrip.

Builds a reference-style state_dict FROM the flax tree (export with the
inverse name mapping) and verifies ``load_reference_checkpoint`` fills every
parameter — i.e. the name/layout mapping is complete and invertible for the
RSPrompter-anchor tree. Packed-MHA splitting is covered separately.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsprompter_tpu.engine.checkpoint import (
    REFERENCE_PTH_REVISE_KEYS,
    _split_packed_mha,
    load_reference_checkpoint,
)
from rsprompter_tpu.models.detectors.rsprompter_anchor import RSPrompterAnchor
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.utils.torch_convert import flax_to_torch
from rsprompter_tpu.utils.testing import demo_batch

TINY_VISION = SamVisionConfig(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    image_size=64, patch_size=8, window_size=4, global_attn_indexes=(1,),
    output_channels=32,
)


def _invert_revise(key: str) -> str:
    """Map an exported flax-name key back to reference (mmdet) naming."""
    subs = [
        (r"^backbone\.", "backbone.vision_encoder."),
        (r"^shared_image_embedding\.", "shared_image_embedding.shared_image_embedding."),
        (r"^neck_feature_aggregator\.", "neck.feature_aggregator."),
        (r"^neck_feature_spliter\.", "neck.feature_spliter."),
        (r"\.mask_decoder\.", ".mask_decoder.mask_decoder."),
    ]
    for pat, repl in subs:
        key = re.sub(pat, repl, key, count=1)
    return key


def test_anchor_reference_checkpoint_roundtrip():
    model = RSPrompterAnchor(
        vision_config=TINY_VISION, image_size=64, num_classes=1,
        prompt_shape=(6, 3), select_layers=(1, 2), aggregator_hidden=8,
        rpn_strides=(2, 4, 8, 16, 32), roi_strides=(2, 4, 8, 16),
        num_samples=8,
        train_cfg=dict(rpn=dict(num=8),
                       rpn_proposal=dict(nms_pre=20, max_per_img=10, pre_nms_total=30)),
    )
    batch = {k: jnp.asarray(v) for k, v in demo_batch(1, (64, 64)).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    )
    params = variables["params"]
    # export with reference-style names; mask-head linears use the tiny
    # geometry (8 ch, roi 14 -> conv stride 2 -> 7)
    flat = flax_to_torch(params)
    # invert the flatten reorder is identity here (we re-apply it on load with
    # the same dims), so export plainly and rename
    sd = {_invert_revise(k): v for k, v in flat.items()}

    # tiny model flatten dims differ from the full-size defaults
    import rsprompter_tpu.engine.checkpoint as ck

    orig = dict(ck.REFERENCE_FLATTEN_LINEARS)
    ck.REFERENCE_FLATTEN_LINEARS.clear()
    try:
        restored, missing = load_reference_checkpoint(params, sd, verbose=False)
    finally:
        ck.REFERENCE_FLATTEN_LINEARS.update(orig)
    assert not missing, missing[:8]
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_mha_split():
    c = 8
    rs = np.random.RandomState(0)
    w = rs.randn(3 * c, c).astype(np.float32)
    b = rs.randn(3 * c).astype(np.float32)
    sd = {
        "head.self_attn.attn.in_proj_weight": w,
        "head.self_attn.attn.in_proj_bias": b,
        "head.self_attn.attn.out_proj.weight": rs.randn(c, c).astype(np.float32),
        "head.self_attn.attn.out_proj.bias": rs.randn(c).astype(np.float32),
        "other.weight": rs.randn(2, 2).astype(np.float32),
    }
    out = _split_packed_mha(sd)
    np.testing.assert_array_equal(out["head.self_attn.q_proj.weight"], w[:c])
    np.testing.assert_array_equal(out["head.self_attn.k_proj.weight"], w[c:2*c])
    np.testing.assert_array_equal(out["head.self_attn.v_proj.weight"], w[2*c:])
    np.testing.assert_array_equal(out["head.self_attn.q_proj.bias"], b[:c])
    assert "head.self_attn.out_proj.weight" in out
    assert "other.weight" in out
