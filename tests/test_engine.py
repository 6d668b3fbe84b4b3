"""Tests: optimizer freezing, schedules, and the sharded train step on an
8-device CPU mesh (the multi-device strategy of SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rsprompter_tpu.engine.optim import (
    FROZEN,
    TRAIN,
    build_optimizer,
    build_param_label_fn,
    warmup_cosine_schedule,
)
from rsprompter_tpu.engine.train_state import TrainState, make_sharded_train_step, make_train_step
from rsprompter_tpu.models.detectors.rsprompter_anchor import RSPrompterAnchor
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.parallel.mesh import (
    DEFAULT_TP_RULES,
    make_mesh,
    param_shardings,
)
from rsprompter_tpu.utils.testing import demo_batch

TINY_VISION = SamVisionConfig(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    image_size=64, patch_size=8, window_size=4, global_attn_indexes=(1,),
    output_channels=32,
)


def _tiny_model():
    return RSPrompterAnchor(
        vision_config=TINY_VISION, image_size=64, num_classes=1,
        prompt_shape=(10, 3), select_layers=(1, 2), aggregator_hidden=8,
        rpn_strides=(2, 4, 8, 16, 32), roi_strides=(2, 4, 8, 16),
        num_samples=16, pos_fraction=0.25,
        train_cfg=dict(rpn=dict(num=16),
                       rpn_proposal=dict(nms_pre=50, max_per_img=20, pre_nms_total=60)),
    )


def test_label_fn_freeze_and_override():
    params = {
        "backbone": {"layers_0": {"kernel": jnp.zeros(1)},
                     "layers_0_lora_a": {"kernel": jnp.zeros(1)}},
        "rpn_head": {"kernel": jnp.zeros(1)},
    }
    label = build_param_label_fn(["backbone"], ["lora_"])(params)
    assert label["backbone"]["layers_0"]["kernel"] == FROZEN
    assert label["backbone"]["layers_0_lora_a"]["kernel"] == TRAIN
    assert label["rpn_head"]["kernel"] == TRAIN


def test_warmup_cosine_schedule():
    sched = warmup_cosine_schedule(1e-4, total_steps=1000, warmup_steps=50)
    assert float(sched(0)) == pytest.approx(1e-7, rel=0.1)
    assert float(sched(50)) == pytest.approx(1e-4, rel=0.01)
    assert float(sched(999)) == pytest.approx(1e-7, rel=0.2)


def test_frozen_params_stay_fixed():
    model = _tiny_model()
    batch = {k: jnp.asarray(v) for k, v in demo_batch(2, (64, 64)).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1), method="loss"
    )
    params = variables["params"]
    tx, labels = build_optimizer(
        params, base_lr=1e-3, total_steps=100,
        freeze_paths=["backbone", "shared_image_embedding", "mask_decoder", "no_mask_embed"],
    )
    assert labels["backbone"]["patch_embed"]["projection"]["kernel"] == FROZEN
    assert labels["roi_head"]["mask_head"]["mask_decoder"]["iou_token"]["embedding"] == FROZEN
    assert labels["roi_head"]["mask_head"]["point_emb_8"]["kernel"] == TRAIN

    # snapshot before the step (state buffers are donated into the jit)
    pos_embed_before = np.asarray(params["backbone"]["pos_embed"]).copy()
    rpn_before = np.asarray(params["rpn_head"]["rpn_conv"]["kernel"]).copy()
    state = TrainState.create(params, variables.get("batch_stats"), tx)
    step = make_train_step(model, tx)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # frozen leaves identical; trained leaves moved
    np.testing.assert_array_equal(
        np.asarray(new_state.params["backbone"]["pos_embed"]), pos_embed_before
    )
    moved = np.abs(
        np.asarray(new_state.params["rpn_head"]["rpn_conv"]["kernel"]) - rpn_before
    ).max()
    assert moved > 0


def test_sharded_train_step_dp_tp_zero():
    """Full training step over a 4x2 (data x model) mesh with ZeRO opt state."""
    mesh = make_mesh(n_data=4, n_model=2)
    model = _tiny_model()
    batch = {k: jnp.asarray(v) for k, v in demo_batch(4, (64, 64)).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1), method="loss"
    )
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-3, total_steps=100,
        freeze_paths=["shared_image_embedding"],
    )
    state = TrainState.create(variables["params"], variables.get("batch_stats"), tx)
    step, sharded_state = make_sharded_train_step(
        model, tx, mesh, state, batch, tp_rules=DEFAULT_TP_RULES, zero=True
    )
    new_state, metrics = step(sharded_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # TP rule applied: qkv kernel sharded over 'model'
    qkv = new_state.params["backbone"]["layers_0"]["attn"]["qkv"]["kernel"]
    spec = qkv.sharding.spec
    assert "model" in str(spec)


def test_sharded_predict_dp():
    """Inference data-parallel over the 8-device mesh."""
    from rsprompter_tpu.engine.train_state import make_sharded_predict

    mesh = make_mesh(n_data=8, n_model=1)
    model = _tiny_model()
    batch = {k: jnp.asarray(v) for k, v in demo_batch(8, (64, 64)).items()}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, method="predict")
    predict, sharded_vars = make_sharded_predict(model, mesh, variables, batch)
    dets, mask_probs = predict(sharded_vars, batch)
    assert dets.boxes.shape[0] == 8
    assert np.isfinite(np.asarray(dets.scores)).all()
    # batch outputs stay sharded over 'data'
    assert "data" in str(dets.boxes.sharding.spec)
