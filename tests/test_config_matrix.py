"""Config-matrix completeness: every reference leaf config has a counterpart
that loads and builds (reference configs/rsprompter/*.py — 18 leaves), and
the query-peft-512 combination (query variant + PseudoFeatureAggregator +
512^2 + LoRA, the only config family exercising all four together) runs a
loss + predict smoke.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from rsprompter_tpu.apis.build import build_detector, freeze_paths_for
from rsprompter_tpu.core.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_DIR = os.path.join(REPO, "configs", "rsprompter")

REFERENCE_LEAVES = [
    "rsprompter_anchor-nwpu-peft-512",
    "rsprompter_anchor-nwpu",
    "rsprompter_anchor-ssdd",
    "rsprompter_anchor-whu",
    "rsprompter_query-nwpu-peft-512",
    "rsprompter_query-nwpu",
    "rsprompter_query-ssdd",
    "rsprompter_query-whu",
    "samdet-nwpu",
    "samdet-ssdd",
    "samdet-whu",
    "samseg-mask2former-nwpu",
    "samseg-mask2former-ssdd",
    "samseg-mask2former-whu",
    "samseg-maskrcnn-nwpu",
    "samseg-maskrcnn-ssdd",
    "samseg-maskrcnn-whu",
]


def test_all_reference_leaves_present():
    have = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(CFG_DIR, "*.py"))
    }
    missing = [n for n in REFERENCE_LEAVES if n not in have]
    assert not missing, f"missing leaf configs: {missing}"


@pytest.mark.parametrize("name", REFERENCE_LEAVES)
def test_leaf_config_builds(name):
    cfg = Config.fromfile(os.path.join(CFG_DIR, f"{name}.py"))
    model = build_detector(cfg.model)
    assert model is not None
    freeze, override = freeze_paths_for(cfg.model)
    assert isinstance(freeze, list)
    # dataset-specific knobs survived inheritance
    if "nwpu" in name:
        assert cfg.model["num_classes"] == 10
    else:
        assert cfg.model["num_classes"] == 1
    if name.startswith("rsprompter_query-nwpu"):
        assert tuple(cfg.model["prompt_shape"]) == (70, 5)
    if name.startswith("rsprompter_query-ssdd"):
        assert tuple(cfg.model["prompt_shape"]) == (30, 5)
    if name.endswith("peft-512"):
        assert cfg.model["image_size"] == 512
        assert cfg.model["aggregator_type"] == "pseudo"
        assert cfg.model["peft_config"]["r"] == 16
        assert "lora_a" in override or "lora_" in " ".join(override)


def test_query_peft_512_loss_and_predict_smoke():
    """Scaled-down functional smoke of the query+pseudo+LoRA+bucket combo."""
    from rsprompter_tpu.utils.testing import demo_batch

    cfg = Config.fromfile(
        os.path.join(CFG_DIR, "rsprompter_query-nwpu-peft-512.py")
    )
    mc = dict(cfg.model)
    mc.update(
        image_size=64,
        prompt_shape=(4, 3),
        train_cfg=dict(num_points=64, oversample_ratio=2.0,
                       importance_sample_ratio=0.5),
        test_cfg=dict(max_per_image=4),
    )
    model = build_detector(mc)
    assert model.aggregator_type == "pseudo"
    assert model.lora_rank == 16
    batch = {
        k: jnp.asarray(v) for k, v in demo_batch(1, (64, 64), max_gt=4).items()
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    )
    losses = model.apply(variables, batch, jax.random.PRNGKey(1), method="loss")
    total = sum(float(v) for k, v in losses.items() if k.startswith("loss"))
    assert jnp.isfinite(total)
    dets, masks = model.apply(variables, batch, method="predict")
    assert jnp.isfinite(masks).all()


def test_peft_512_mismatched_size_pretrained_load():
    """The whole point of the *-peft-512 configs is loading a 1024-native SAM
    checkpoint into a smaller-input model (north-star config #5). Exercise
    ``load_sam_pretrained`` with a checkpoint whose pos-embed/rel-pos tables
    are at a LARGER native grid than the model and check the load-time resize
    (reference rule: vit_sam.py:576-588 bicubic pos-embed, :636-662 linear
    rel-pos) lands the right shapes and values."""
    import numpy as np
    import torch
    import torch.nn.functional as TF

    from rsprompter_tpu.engine.checkpoint import load_sam_pretrained

    cfg = Config.fromfile(
        os.path.join(CFG_DIR, "rsprompter_query-nwpu-peft-512.py")
    )
    mc = dict(cfg.model)
    mc.update(image_size=64, prompt_shape=(4, 3))
    model = build_detector(mc)
    batch_shape = jnp.zeros((1, 64, 64, 3))
    from rsprompter_tpu.utils.testing import demo_batch

    batch = {
        k: jnp.asarray(v) for k, v in demo_batch(1, (64, 64), max_gt=4).items()
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    )
    params = variables["params"]
    # grid at image_size 64 / patch 16 = 4 -> pos_embed (1,4,4,768), global
    # rel-pos (7, 64); the synthetic ckpt is 1024-native: (1,64,64,768)/(127,64)
    rng = np.random.RandomState(0)
    sd = {
        "vision_encoder.pos_embed": rng.randn(1, 64, 64, 768).astype(np.float32),
        "vision_encoder.layers.2.attn.rel_pos_h": rng.randn(127, 64).astype(
            np.float32
        ),
    }
    new_params, report = load_sam_pretrained(params, sd, mc["type"])
    bb = new_params["backbone"]
    assert bb["pos_embed"].shape == (1, 4, 4, 768)
    assert bb["layers_2"]["attn"]["rel_pos_h"].shape == (7, 64)
    # values match the reference interpolation rule exactly
    want_pe = TF.interpolate(
        torch.from_numpy(sd["vision_encoder.pos_embed"]).permute(0, 3, 1, 2),
        size=(4, 4), mode="bicubic", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(bb["pos_embed"]), want_pe, atol=1e-6)
    rel = sd["vision_encoder.layers.2.attn.rel_pos_h"]
    want_rel = TF.interpolate(
        torch.from_numpy(rel).reshape(1, 127, -1).permute(0, 2, 1),
        size=7, mode="linear",
    ).reshape(-1, 7).permute(1, 0).numpy()
    np.testing.assert_allclose(
        np.asarray(bb["layers_2"]["attn"]["rel_pos_h"]), want_rel, atol=1e-6
    )
