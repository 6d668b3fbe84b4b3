"""End-to-end RSPrompter-anchor: loss + predict on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsprompter_tpu.models.detectors.rsprompter_anchor import RSPrompterAnchor
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.utils.testing import demo_batch

TINY_VISION = SamVisionConfig(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    image_size=64,
    patch_size=8,
    window_size=4,
    global_attn_indexes=(1,),
    output_channels=32,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = RSPrompterAnchor(
        vision_config=TINY_VISION,
        image_size=64,
        num_classes=1,
        prompt_shape=(10, 3),
        select_layers=(1, 2),
        aggregator_hidden=8,
        rpn_strides=(2, 4, 8, 16, 32),
        roi_strides=(2, 4, 8, 16),
        num_samples=16,
        pos_fraction=0.25,
        train_cfg=dict(
            rpn=dict(num=16),
            rpn_proposal=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
        ),
        test_cfg=dict(
            rpn=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
            rcnn=dict(score_thr=0.0, max_per_img=4),
        ),
    )
    batch = {k: jnp.asarray(v) for k, v in demo_batch(2, (64, 64)).items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1), method="loss"
    )
    return model, variables, batch


def test_loss_mode(model_and_params):
    model, variables, batch = model_and_params
    losses = model.apply(
        variables, batch, jax.random.PRNGKey(2), method="loss",
        mutable=["batch_stats"],
    )[0]
    expected = {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox", "loss_mask"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert float(losses["loss_mask"]) > 0


def test_gradients_reach_point_emb_through_frozen_decoder(model_and_params):
    model, variables, batch = model_and_params

    def mask_loss(params):
        losses = model.apply(
            {**variables, "params": params}, batch, jax.random.PRNGKey(2),
            method="loss", mutable=["batch_stats"],
        )[0]
        return losses["loss_mask"]

    grads = jax.grad(mask_loss)(variables["params"])
    g_pe = grads["roi_head"]["mask_head"]["point_emb_8"]["kernel"]
    assert np.abs(np.asarray(g_pe)).max() > 0
    # backbone is stop-gradiented
    g_bb = jax.tree_util.tree_leaves(grads["backbone"])
    assert all(np.abs(np.asarray(g)).max() == 0 for g in g_bb)


def test_predict_mode(model_and_params):
    model, variables, batch = model_and_params
    dets, mask_probs = model.apply(variables, batch, method="predict")
    b = batch["images"].shape[0]
    assert dets.boxes.shape == (b, 4, 4)
    # SAM masks are full-frame at 4x the image-embedding grid (8x8 -> 32x32)
    assert mask_probs.shape == (b, 4, 32, 32)
    assert np.asarray(mask_probs).min() >= 0 and np.asarray(mask_probs).max() <= 1


def test_mask_chain_learns_on_fixed_batch(model_and_params):
    """VERDICT r2 missing #1: optimizing ONLY loss_mask on a fixed batch must
    decrease it through the point_emb -> SAM-decoder chain (proves the
    train-side mask stream carries usable gradient, not just nonzero grad).
    Reference chain anchor: mmdet/rsprompter/models.py:1720-1744."""
    import optax

    model, variables, batch = model_and_params
    params = variables["params"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    def mask_loss(p):
        losses = model.apply(
            {**variables, "params": p}, batch, jax.random.PRNGKey(2),
            method="loss", mutable=["batch_stats"],
        )[0]
        return losses["loss_mask"]

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(mask_loss)(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    losses = []
    for _ in range(12):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    # the chain must actually optimize: final loss well below the initial
    assert losses[-1] < 0.7 * losses[0], losses


def test_mask_loss_trains_through_point_emb_chain(model_and_params):
    """VERDICT r2 #2 guard: gradients reach ``point_emb`` THROUGH the SAM mask
    decoder, and one SGD step on the mask chain decreases ``loss_mask`` on a
    fixed batch (reference chain: point_emb -> sparse prompts -> SamMaskDecoder
    -> CE vs full-image targets, mmdet/rsprompter/models.py:1720-1744)."""
    import flax

    model, variables, batch = model_and_params
    rng = jax.random.PRNGKey(7)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def mask_loss(p):
        losses = model.apply(
            {"params": p, **extra}, batch, rng, method="loss",
            mutable=["batch_stats"],
        )[0]
        return losses["loss_mask"]

    l0, grads = jax.value_and_grad(mask_loss)(params)
    flat = flax.traverse_util.flatten_dict(grads)
    pe_sq = [
        float(jnp.square(v).sum())
        for k, v in flat.items()
        if any(part.startswith("point_emb") for part in k)
    ]
    assert pe_sq, "no point_emb params found"
    assert sum(pe_sq) > 0.0, "no gradient reaches point_emb through the SAM decoder"

    # one small SGD step on the whole chain must reduce the mask loss
    lr = 1e-3
    gn = jnp.sqrt(sum(jnp.square(v).sum() for v in flat.values()))
    stepped = jax.tree_util.tree_map(lambda p, g: p - lr * g / (gn + 1e-8), params, grads)
    l1 = mask_loss(stepped)
    assert float(l1) < float(l0), f"mask loss did not decrease: {l0} -> {l1}"


def test_tensor_mode(model_and_params):
    """mode='tensor' raw-outputs contract (reference base.py:59-99): RPN
    per-level scores/deltas + raw RoI outputs, no decode/NMS/postprocess."""
    model, variables, batch = model_and_params
    out = jax.jit(lambda v, b: model.apply(v, b, method="tensor"))(
        variables, batch
    )
    rpn_cls, rpn_deltas, cls_logits, bbox_deltas, mask_logits, iou = out
    assert len(rpn_cls) == len(rpn_deltas) == 5  # one per FPN level
    n = cls_logits.shape[1]
    assert cls_logits.shape == (2, n, model.num_classes + 1)
    assert bbox_deltas.shape == (2, n, 4 * model.num_classes)
    m = mask_logits.shape[1]
    assert iou.shape == (2, m)
    assert mask_logits.ndim == 4  # (B, M, S, S) raw SAM-decoder logits
    for leaf in jax.tree_util.tree_leaves(out):
        assert bool(jnp.isfinite(leaf).all())
