"""End-to-end SAM-seg Mask R-CNN: loss mode + predict mode on tiny shapes.

Mirrors the reference detector-test pattern
(``tests/test_models/test_detectors/test_maskformer.py:18-80``): shrunken
widths, random inputs, assert a finite loss dict and well-formed predictions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsprompter_tpu.models.detectors.two_stage import SAMSegMaskRCNN
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
    model = SAMSegMaskRCNN(
        vision_config=TINY_VISION,
        image_size=64,
        num_classes=2,
        select_layers=(1, 2),
        aggregator_hidden=8,
        rpn_strides=(2, 4, 8, 16, 32),
        roi_strides=(2, 4, 8, 16),
        num_samples=32,
        pos_fraction=0.25,
        train_cfg=dict(
            rpn=dict(num=16), rpn_proposal=dict(nms_pre=50, max_per_img=20, pre_nms_total=60)
        ),
        test_cfg=dict(
            rpn=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
            rcnn=dict(score_thr=0.0, max_per_img=5),
        ),
    )
    batch = {k: jnp.asarray(v) for k, v in demo_batch(2, (64, 64), num_classes=2).items()}
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
    expected = {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox", "loss_mask", "acc"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_loss_differentiable(model_and_params):
    model, variables, batch = model_and_params

    def total_loss(params):
        losses = model.apply(
            {**variables, "params": params}, batch, jax.random.PRNGKey(2),
            method="loss", mutable=["batch_stats"],
        )[0]
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    grads = jax.grad(total_loss)(variables["params"])
    # frozen backbone gets zero grads (stop_gradient); heads get nonzero
    g_rpn = jax.tree_util.tree_leaves(grads["rpn_head"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in g_rpn)
    g_backbone = jax.tree_util.tree_leaves(grads["backbone"])
    assert all(np.abs(np.asarray(g)).max() == 0 for g in g_backbone)


def test_predict_mode(model_and_params):
    model, variables, batch = model_and_params
    dets, mask_probs = model.apply(variables, batch, method="predict")
    b = batch["images"].shape[0]
    assert dets.boxes.shape == (b, 5, 4)
    assert dets.scores.shape == (b, 5)
    assert dets.labels.shape == (b, 5)
    assert mask_probs.shape[:2] == (b, 5)
    assert np.asarray(mask_probs).min() >= 0 and np.asarray(mask_probs).max() <= 1
    # valid detections have boxes inside the image
    v = np.asarray(dets.valid)
    boxes = np.asarray(dets.boxes)
    assert (boxes[v] >= 0).all() and (boxes[v][:, 2:] <= 64).all()


def test_tensor_mode(model_and_params):
    """mode='tensor': RPN raw outputs + RoI cls/deltas on all proposals +
    FCN mask logits on the first <=100 rois (reference
    standard_roi_head.forward slice)."""
    model, variables, batch = model_and_params
    out = jax.jit(lambda v, b: model.apply(v, b, method="tensor"))(
        variables, batch
    )
    rpn_cls, rpn_deltas, cls_logits, bbox_deltas, mask_logits = out
    n = cls_logits.shape[1]
    assert cls_logits.shape == (2, n, model.num_classes + 1)
    assert bbox_deltas.shape == (2, n, 4 * model.num_classes)
    assert mask_logits.shape[1] == min(n, 100)
    assert mask_logits.shape[-1] == model.num_classes  # per-class FCN masks
