"""Load-time pos-embed / rel-pos resize for non-native input sizes.

The reference loads 1024-native SAM checkpoints into models built at other
input sizes by resizing the abs pos-embed bicubically and the decomposed
rel-pos tables linearly AT LOAD TIME (reference
``mmpretrain/models/backbones/vit_sam.py:576-588`` `_prepare_pos_embed` ->
``resize_pos_embed`` with align_corners=False, and ``:636-662``
`_prepare_relative_position` with mode='linear'). That rule is what makes the
``*-peft-512`` configs loadable from ``facebook/sam-vit-base`` weights.

This file proves our ``torch_to_flax`` reproduces it end to end: a tiny HF
SamModel built at native size 64 loads into a 32-input-size flax encoder and
matches the activations of an HF model given the reference-interpolated
state_dict.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam import SamVisionEncoder
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.utils.torch_convert import torch_to_flax

VISION_KW = dict(
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=2,
    image_size=64,
    patch_size=8,
    window_size=4,
    global_attn_indexes=(1,),
    output_channels=32,
    num_pos_feats=16,
)


def _tiny_hf_vision(image_size):
    from transformers.models.sam import configuration_sam, modeling_sam

    torch.manual_seed(0)
    cfg = configuration_sam.SamConfig(
        vision_config=dict(
            **{**VISION_KW, "global_attn_indexes": [1], "image_size": image_size}
        ),
    )
    cfg.vision_config._attn_implementation = "eager"
    cfg._attn_implementation = "eager"
    model = modeling_sam.SamModel(cfg).vision_encoder
    model.eval()
    return model


def _reference_interpolate(sd, dst_grid, dst_rel_lens):
    """Transcription of the reference's load-time rule (vit_sam.py:576-662):
    bicubic align_corners=False on the (1,H,W,C) pos_embed; per-table linear
    interpolate on any rel_pos_* whose length differs from the target."""
    out = dict(sd)
    pe = sd["pos_embed"].float()  # (1, H, W, C)
    if pe.shape[1] != dst_grid:
        pe = F.interpolate(
            pe.permute(0, 3, 1, 2),
            size=(dst_grid, dst_grid),
            mode="bicubic",
            align_corners=False,
        ).permute(0, 2, 3, 1)
        out["pos_embed"] = pe
    for k, v in sd.items():
        if "rel_pos_" in k and v.shape[0] != dst_rel_lens.get(k, v.shape[0]):
            L2 = dst_rel_lens[k]
            new = F.interpolate(
                v.float().reshape(1, v.shape[0], -1).permute(0, 2, 1),
                size=L2,
                mode="linear",
            )
            out[k] = new.reshape(-1, L2).permute(1, 0)
    return out


@pytest.fixture(scope="module")
def hf64():
    model = _tiny_hf_vision(64)
    # non-degenerate rel-pos / pos-embed (HF zero-inits them)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "rel_pos" in k or "pos_embed" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(sd)
    return model


def test_resize_load_matches_reference_interpolation(hf64):
    """64-native HF checkpoint -> 32-input flax encoder, vs an HF model fed
    the reference-interpolated state_dict. Grid 8->4; global-layer rel-pos
    (15,C)->(7,C); window-layer tables (7,C) untouched."""
    cfg32 = SamVisionConfig(**{**VISION_KW, "image_size": 32})
    enc = SamVisionEncoder(config=cfg32)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]

    sd64 = hf64.state_dict()
    params, missing, used = torch_to_flax(sd64, params)
    assert not missing, missing

    # shape checks: resize actually happened
    assert params["pos_embed"].shape == (1, 4, 4, 32)
    assert params["layers_1"]["attn"]["rel_pos_h"].shape == (7, 16)

    # torch side: reference-interpolated state_dict into a 32-native HF model
    hf32 = _tiny_hf_vision(32)
    dst_rel = {
        k: (7 if "layers.1." in k else v.shape[0])
        for k, v in sd64.items()
        if "rel_pos_" in k
    }
    hf32.load_state_dict(_reference_interpolate(sd64, 4, dst_rel))

    x = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    neck_out, hidden = enc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        t_out = hf32(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(neck_out),
        t_out.last_hidden_state.numpy().transpose(0, 2, 3, 1),
        atol=2e-4,
        rtol=0,
    )
    for i, th in enumerate(t_out.hidden_states):
        np.testing.assert_allclose(
            np.asarray(hidden[i]), th.numpy(), atol=2e-4, rtol=0,
            err_msg=f"hidden_{i}",
        )


def test_resize_load_native_size_untouched(hf64):
    """Same-size load must bypass the resize path bit-exactly."""
    cfg64 = SamVisionConfig(**VISION_KW)
    enc = SamVisionEncoder(config=cfg64)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params, missing, _ = torch_to_flax(hf64.state_dict(), params)
    assert not missing
    np.testing.assert_array_equal(
        np.asarray(params["pos_embed"]),
        hf64.state_dict()["pos_embed"].numpy(),
    )


def test_resize_load_rejects_channel_mismatch():
    """Only the positional axes may differ — a channel mismatch still raises."""
    cfg = SamVisionConfig(**{**VISION_KW, "image_size": 32})
    enc = SamVisionEncoder(config=cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    bad = {"pos_embed": np.zeros((1, 8, 8, 64), np.float32)}  # C=64 != 32
    with pytest.raises(ValueError, match="Shape mismatch"):
        torch_to_flax(bad, params)
