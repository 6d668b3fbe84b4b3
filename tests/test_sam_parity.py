"""Golden-parity tests: flax SAM vs the installed HF torch SAM.

Strategy (SURVEY §4 "TPU-build test plan"): random-init a *small* HF torch
SamModel, convert its state_dict with ``torch_to_flax``, and compare
activations submodule by submodule (fp32, tol ~1e-4).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam import (
    SamMaskDecoder,
    SamPromptEncoder,
    SamVisionEncoder,
    SamModel,
)
from rsprompter_tpu.models.sam.configs import (
    SamConfig,
    SamMaskDecoderConfig,
    SamPromptEncoderConfig,
    SamVisionConfig,
)
from rsprompter_tpu.utils.torch_convert import torch_to_flax

import transformers
from transformers.models.sam import configuration_sam
from transformers.models.sam import modeling_sam


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
PROMPT_KW = dict(hidden_size=32, image_size=64, patch_size=8, mask_input_channels=8)
DECODER_KW = dict(hidden_size=32, num_attention_heads=2, mlp_dim=64, iou_head_hidden_dim=32)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    cfg = configuration_sam.SamConfig(
        vision_config=dict(**{**VISION_KW, "global_attn_indexes": [1]}),
        prompt_encoder_config=dict(**PROMPT_KW),
        mask_decoder_config=dict(**DECODER_KW),
    )
    cfg.vision_config._attn_implementation = "eager"
    cfg._attn_implementation = "eager"
    model = modeling_sam.SamModel(cfg)
    model.eval()
    # non-degenerate rel-pos / pos-embed (HF zero-inits them)
    sd = model.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "rel_pos" in k or "pos_embed" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.02
    model.load_state_dict(sd)
    return model


@pytest.fixture(scope="module")
def my_config():
    return SamConfig(
        vision_config=SamVisionConfig(**VISION_KW),
        prompt_encoder_config=SamPromptEncoderConfig(**PROMPT_KW),
        mask_decoder_config=SamMaskDecoderConfig(**DECODER_KW),
    )


def _assert_close(a, b, tol=2e-4, name=""):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
    err = np.abs(a - b).max()
    assert err < tol, f"{name}: max err {err}"


def test_vision_encoder_parity(hf_model, my_config):
    enc = SamVisionEncoder(config=my_config.vision_config)
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)

    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params, missing, used = torch_to_flax(
        hf_model.vision_encoder.state_dict(), params
    )
    assert not missing, missing

    neck_out, hidden = enc.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        t_out = hf_model.vision_encoder(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    # neck output: HF NCHW -> NHWC
    _assert_close(
        neck_out, t_out.last_hidden_state.numpy().transpose(0, 2, 3, 1), name="neck"
    )
    # hidden states: embedding output first, then each layer's output
    # (the 4.38.1 depth+1 contract RSPrompter's aggregator indexes into)
    t_hidden = t_out.hidden_states
    assert len(hidden) == len(t_hidden)
    for i, th in enumerate(t_hidden):
        _assert_close(hidden[i], th.numpy(), name=f"hidden_{i}")


def test_prompt_encoder_box_parity(hf_model, my_config):
    pe = SamPromptEncoder(config=my_config.prompt_encoder_config)
    boxes = np.array([[[4.0, 8.0, 40.0, 60.0], [0.0, 0.0, 32.0, 32.0]]], np.float32)

    variables = pe.init(jax.random.PRNGKey(0), input_boxes=jnp.asarray(boxes))
    params, missing, _ = torch_to_flax(
        hf_model.prompt_encoder.state_dict(),
        variables["params"],
    )
    assert not missing, missing

    sparse, dense = pe.apply({"params": params}, input_boxes=jnp.asarray(boxes))
    with torch.no_grad():
        t_sparse, t_dense = hf_model.prompt_encoder(
            input_points=None,
            input_labels=None,
            input_boxes=torch.from_numpy(boxes),
            input_masks=None,
        )
    _assert_close(sparse, t_sparse.detach().numpy(), name="sparse")
    _assert_close(dense, t_dense.detach().numpy().transpose(0, 2, 3, 1), name="dense")


def test_prompt_encoder_points_parity(hf_model, my_config):
    pe = SamPromptEncoder(config=my_config.prompt_encoder_config)
    points = np.array([[[[8.0, 8.0], [40.0, 20.0]]]], np.float32)  # (1,1,2,2)
    labels = np.array([[[1, 0]]], np.int32)

    variables = pe.init(
        jax.random.PRNGKey(0),
        input_points=jnp.asarray(points),
        input_labels=jnp.asarray(labels),
    )
    params, missing, _ = torch_to_flax(
        hf_model.prompt_encoder.state_dict(),
        variables["params"],
    )
    assert not missing, missing
    sparse, dense = pe.apply(
        {"params": params},
        input_points=jnp.asarray(points),
        input_labels=jnp.asarray(labels),
    )
    with torch.no_grad():
        t_sparse, t_dense = hf_model.prompt_encoder(
            input_points=torch.from_numpy(points),
            input_labels=torch.from_numpy(labels),
            input_boxes=None,
            input_masks=None,
        )
    _assert_close(sparse, t_sparse.detach().numpy(), name="sparse")
    _assert_close(dense, t_dense.detach().numpy().transpose(0, 2, 3, 1), name="dense")


def test_mask_decoder_parity(hf_model, my_config):
    dec = SamMaskDecoder(config=my_config.mask_decoder_config)
    rs = np.random.RandomState(1)
    b, p, t, c, s = 2, 3, 4, 32, 8
    image_emb = rs.randn(b, s, s, c).astype(np.float32)
    image_pe = rs.randn(1, s, s, c).astype(np.float32)
    sparse = rs.randn(b, p, t, c).astype(np.float32)
    dense = rs.randn(b, s, s, c).astype(np.float32)

    variables = dec.init(
        jax.random.PRNGKey(0),
        jnp.asarray(image_emb),
        jnp.broadcast_to(jnp.asarray(image_pe), (b, s, s, c)),
        jnp.asarray(sparse),
        jnp.asarray(dense),
    )
    params, missing, _ = torch_to_flax(
        hf_model.mask_decoder.state_dict(),
        variables["params"],
    )
    assert not missing, missing

    for multimask in (False, True):
        masks, iou = dec.apply(
            {"params": params},
            jnp.asarray(image_emb),
            jnp.broadcast_to(jnp.asarray(image_pe), (b, s, s, c)),
            jnp.asarray(sparse),
            jnp.asarray(dense),
            multimask_output=multimask,
        )
        with torch.no_grad():
            t_masks, t_iou = hf_model.mask_decoder(
                image_embeddings=torch.from_numpy(image_emb.transpose(0, 3, 1, 2)),
                image_positional_embeddings=torch.from_numpy(
                    np.broadcast_to(image_pe.transpose(0, 3, 1, 2), (b, c, s, s)).copy()
                ),
                sparse_prompt_embeddings=torch.from_numpy(sparse),
                dense_prompt_embeddings=torch.from_numpy(dense.transpose(0, 3, 1, 2)),
                multimask_output=multimask,
            )
        _assert_close(masks, t_masks.numpy(), tol=5e-4, name=f"masks mm={multimask}")
        _assert_close(iou, t_iou.numpy(), tol=5e-4, name=f"iou mm={multimask}")


def test_full_sam_box_prompt_parity(hf_model, my_config):
    """End-to-end: pixel values + box prompts -> masks (the SAM-det path)."""
    model = SamModel(config=my_config)
    rs = np.random.RandomState(2)
    x = rs.randn(1, 64, 64, 3).astype(np.float32)
    boxes = np.array([[[4.0, 8.0, 40.0, 60.0]]], np.float32)

    variables = model.init(
        jax.random.PRNGKey(0),
        pixel_values=jnp.asarray(x),
        input_boxes=jnp.asarray(boxes),
        multimask_output=False,
    )
    params, missing, _ = torch_to_flax(
        hf_model.state_dict(),
        variables["params"],
    )
    # HF ties prompt_encoder.shared_embedding to shared_image_embedding and
    # drops the duplicate from the state_dict; fill it explicitly.
    missing = [
        m for m in missing if "prompt_encoder.shared_embedding" not in m
    ]
    assert not missing, missing
    sd = hf_model.state_dict()
    tied = jnp.asarray(sd["shared_image_embedding.positional_embedding"].numpy())
    params["prompt_encoder"]["shared_embedding"]["positional_embedding"] = tied

    masks, iou = model.apply(
        {"params": params},
        pixel_values=jnp.asarray(x),
        input_boxes=jnp.asarray(boxes),
        multimask_output=False,
    )
    with torch.no_grad():
        t_out = hf_model(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)),
            input_boxes=torch.from_numpy(boxes),
            multimask_output=False,
        )
    _assert_close(masks, t_out.pred_masks.numpy(), tol=1e-3, name="pred_masks")
    _assert_close(iou, t_out.iou_scores.numpy(), tol=1e-3, name="iou_scores")
