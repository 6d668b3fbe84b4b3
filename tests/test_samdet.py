"""End-to-end SAM-det: detector loss, predict with SAM box prompts, oracle mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsprompter_tpu.models.detectors.samdet import SAMDet
from rsprompter_tpu.models.sam.configs import (
    SamConfig,
    SamMaskDecoderConfig,
    SamPromptEncoderConfig,
    SamVisionConfig,
)
from rsprompter_tpu.utils.testing import demo_batch

TINY_SAM = SamConfig(
    vision_config=SamVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        image_size=64, patch_size=8, window_size=4, global_attn_indexes=(1,),
        output_channels=32, num_pos_feats=16,
    ),
    prompt_encoder_config=SamPromptEncoderConfig(
        hidden_size=32, image_size=64, patch_size=8, mask_input_channels=8
    ),
    mask_decoder_config=SamMaskDecoderConfig(
        hidden_size=32, num_attention_heads=2, mlp_dim=64, iou_head_hidden_dim=32
    ),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = SAMDet(
        sam_cfg=TINY_SAM,
        image_size=64,
        num_classes=2,
        resnet_depth=18,
        rpn_strides=(4, 8, 16, 32, 64),
        roi_strides=(4, 8, 16, 32),
        num_samples=16,
        train_cfg=dict(
            rpn=dict(num=16),
            rpn_proposal=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
        ),
        test_cfg=dict(
            rpn=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
            rcnn=dict(score_thr=0.0, max_per_img=4),
        ),
    )
    batch = {k: jnp.asarray(v) for k, v in demo_batch(2, (64, 64), num_classes=2).items()}
    # init via predict so the (frozen, loss-untouched) segmentor params exist
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, method="predict")
    return model, variables, batch


def test_loss_mode_detector_only(model_and_params):
    model, variables, batch = model_and_params
    losses = model.apply(variables, batch, jax.random.PRNGKey(2), method="loss")
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert "loss_mask" not in losses  # Faster R-CNN branch has no mask head

    def det_loss(params):
        ls = model.apply(
            {**variables, "params": params}, batch, jax.random.PRNGKey(2),
            method="loss",
        )
        return sum(v for k, v in ls.items() if k.startswith("loss"))

    grads = jax.grad(det_loss)(variables["params"])
    # segmentor (frozen SAM) receives no gradient from detector training
    g_seg = jax.tree_util.tree_leaves(grads["segmentor"])
    assert all(np.abs(np.asarray(g)).max() == 0 for g in g_seg)
    g_det = jax.tree_util.tree_leaves(grads["backbone"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in g_det)


def test_predict_with_sam_masks(model_and_params):
    model, variables, batch = model_and_params
    dets, mask_probs = model.apply(variables, batch, method="predict")
    b = batch["images"].shape[0]
    assert dets.boxes.shape == (b, 4, 4)
    assert mask_probs.shape == (b, 4, 32, 32)  # 4x the 8x8 embedding grid
    assert np.asarray(mask_probs).min() >= 0


def test_oracle_predict_uses_gt_boxes(model_and_params):
    model, variables, batch = model_and_params
    dets, mask_probs = model.apply(variables, batch, method="oracle_predict")
    np.testing.assert_allclose(
        np.asarray(dets.boxes), np.asarray(batch["gt_bboxes"])
    )
    v = np.asarray(batch["gt_valid"])
    assert (np.asarray(dets.scores)[v] == 1.0).all()
    assert mask_probs.shape[:2] == batch["gt_bboxes"].shape[:2]


def test_tensor_mode(model_and_params):
    """mode='tensor' for the trainable detector half: RPN per-level raw
    outputs + raw RoI bbox head outputs (no mask head: with_mask=False)."""
    model, variables, batch = model_and_params
    out = jax.jit(lambda v, b: model.apply(v, b, method="tensor"))(
        variables, batch
    )
    rpn_cls, rpn_deltas, cls_logits, bbox_deltas = out
    assert len(rpn_cls) == len(rpn_deltas) == 5
    n = cls_logits.shape[1]
    assert cls_logits.shape == (2, n, model.num_classes + 1)
    assert bbox_deltas.shape == (2, n, 4 * model.num_classes)
