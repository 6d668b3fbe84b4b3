"""LoRA adapter tests: zero-init no-op, gradient flow through frozen backbone."""

import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.engine.optim import FROZEN, TRAIN, build_param_label_fn
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.models.sam.vision_encoder import SamVisionEncoder

TINY = SamVisionConfig(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    image_size=32, patch_size=8, window_size=2, global_attn_indexes=(1,),
    output_channels=32,
)


def test_lora_zero_init_is_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    base = SamVisionEncoder(config=TINY)
    lora = SamVisionEncoder(config=TINY, lora_rank=4)
    p_base = base.init(jax.random.PRNGKey(0), x)["params"]
    p_lora = lora.init(jax.random.PRNGKey(0), x)["params"]
    # lora_b zero-init -> identical output to the base model
    out_b, _ = base.apply({"params": p_base}, x)
    out_l, _ = lora.apply({"params": p_lora}, x)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_l), atol=1e-6)
    assert "qkv_lora_a" in p_lora["layers_0"]["attn"]


def test_lora_changes_output_and_label_split():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    lora = SamVisionEncoder(config=TINY, lora_rank=4)
    params = lora.init(jax.random.PRNGKey(0), x)["params"]
    params["layers_0"]["attn"]["qkv_lora_b"] = (
        jnp.ones_like(params["layers_0"]["attn"]["qkv_lora_b"]) * 0.1
    )
    out0, _ = lora.apply(
        {"params": jax.tree_util.tree_map(lambda p: p, params)}, x
    )
    params["layers_0"]["attn"]["qkv_lora_b"] = jnp.zeros_like(
        params["layers_0"]["attn"]["qkv_lora_b"]
    )
    out1, _ = lora.apply({"params": params}, x)
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 0

    labels = build_param_label_fn(["backbone"], ["lora_"])(
        {"backbone": params}
    )
    assert labels["backbone"]["layers_0"]["attn"]["qkv_lora_a"] == TRAIN
    assert labels["backbone"]["layers_0"]["attn"]["qkv"]["kernel"] == FROZEN


def test_lora_gradients_flow():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    lora = SamVisionEncoder(config=TINY, lora_rank=4)
    params = lora.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        out, _ = lora.apply({"params": p}, x)
        return (out ** 2).mean()

    grads = jax.grad(loss)(params)
    g_a = grads["layers_0"]["attn"]["qkv_lora_a"]
    g_b = grads["layers_0"]["attn"]["qkv_lora_b"]
    # b is zero-init so a's grad is zero, but b receives gradient
    assert np.abs(np.asarray(g_b)).max() > 0
    assert np.asarray(g_a).shape == (32, 4)


def test_remat_matches_and_grads_flow():
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    base = SamVisionEncoder(config=TINY, lora_rank=2)
    remat = SamVisionEncoder(config=TINY, lora_rank=2, remat=True)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    o1, _ = base.apply({"params": params}, x)
    o2, _ = remat.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def loss(p):
        out, _ = remat.apply({"params": p}, x)
        return (out ** 2).mean()

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["layers_0"]["attn"]["qkv_lora_b"])).max() > 0
