"""Flip-TTA wrapper: geometry of the flip/unflip and the merged predict.

Reference: DetTTAModel (`mmdet/models/test_time_augs/det_tta.py:14`) +
`tools/test.py --tta`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rsprompter_tpu.models.detectors.rsprompter_anchor import RSPrompterAnchor
from rsprompter_tpu.models.sam.configs import SamVisionConfig
from rsprompter_tpu.models.tta import hflip_batch, make_tta_predict
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


def test_hflip_mirrors_valid_region_keeps_right_pad():
    b = demo_batch(2, (64, 64))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    # image 0: valid width 48, pad columns 48.. are a sentinel
    img = np.zeros((2, 64, 64, 3), np.float32)
    img[0, :, :48] = np.arange(48, dtype=np.float32)[None, :, None]
    img[0, :, 48:] = -7.0
    batch["images"] = jnp.asarray(img)
    batch["img_shape"] = jnp.asarray([[64, 48], [64, 64]], jnp.int32)

    flipped = hflip_batch(batch)["images"]
    f0 = np.asarray(flipped[0])
    # valid region mirrored into [0, 48)
    assert np.allclose(f0[:, :48, 0], np.arange(48)[::-1][None, :])
    # padding stays on the right
    assert np.allclose(f0[:, 48:], -7.0)
    # double flip = identity
    twice = hflip_batch({**batch, "images": flipped})["images"]
    assert np.allclose(np.asarray(twice), np.asarray(batch["images"]))


def test_tta_predict_shapes_and_validity():
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
    variables = {"params": variables["params"], **(
        {"batch_stats": variables["batch_stats"]} if "batch_stats" in variables else {}
    )}

    dets_plain, probs_plain = model.apply(variables, batch, method="predict")
    tta = make_tta_predict(model, iou_thr=0.5, max_per_img=4)
    dets, probs = jax.jit(tta)(variables, batch)

    assert dets.boxes.shape == dets_plain.boxes.shape
    assert probs.shape == probs_plain.shape
    v = np.asarray(dets.valid)
    s = np.asarray(dets.scores)
    bx = np.asarray(dets.boxes)
    assert v.any(), "TTA merge produced no detections"
    # finite, in-canvas boxes for valid detections
    assert np.isfinite(s[v]).all()
    assert (bx[v] >= -1e-3).all() and (bx[v] <= 64 + 1e-3).all()
