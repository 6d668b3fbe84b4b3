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
