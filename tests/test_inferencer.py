"""DetInferencer: size-bucket routing + draw utility."""

import numpy as np

from rsprompter_tpu.apis.inferencer import DetInferencer, draw_predictions


def _inf(buckets=None):
    return DetInferencer(
        {"type": "RSPrompterAnchor", "arch": "base", "num_classes": 1,
         "image_size": 1024},
        size_buckets=buckets,
    )


def test_bucket_routing():
    inf = _inf([512, 1024])
    assert inf._bucket_for(300, 400) == (512, 512)
    assert inf._bucket_for(512, 100) == (512, 512)
    assert inf._bucket_for(600, 600) == (1024, 1024)
    assert inf._bucket_for(2000, 100) == (1024, 1024)  # clamps to largest
    # no buckets -> config crop size
    inf2 = _inf(None)
    assert inf2._bucket_for(300, 400) == (1024, 1024)


def test_mixed_size_chunk_uses_one_bucket():
    """A chunk with images from different buckets must pipeline + collate at
    ONE bucket (the smallest that fits all) — per-image buckets would resize
    samples to different sizes and break the collate pad."""
    import types

    inf = _inf([256, 512])
    inf.batch_size = 2
    seen = []

    def fake_predict(v, b):
        seen.append(tuple(np.asarray(b["images"]).shape))
        n = b["images"].shape[0]
        dets = types.SimpleNamespace(
            valid=np.zeros((n, 5), bool),
            scores=np.zeros((n, 5), np.float32),
            boxes=np.zeros((n, 5, 4), np.float32),
            labels=np.zeros((n, 5), np.int64),
        )
        return dets, np.zeros((n, 5, 64, 64), np.float32)

    inf._ensure_initialized = lambda b: None
    inf._variables = {}
    inf._predict = fake_predict
    out = inf(
        [np.zeros((200, 200, 3), np.float32),
         np.zeros((400, 400, 3), np.float32)],
        return_masks=False,
    )
    assert len(out["predictions"]) == 2
    assert seen == [(2, 512, 512, 3)]


def test_verify_weights_raises_on_garbage(tmp_path):
    bad = tmp_path / "ckpt.pth"
    bad.write_bytes(b"not a checkpoint")
    inf = DetInferencer(
        {"type": "RSPrompterAnchor", "arch": "base", "num_classes": 1,
         "image_size": 1024},
        weights=str(bad),
    )
    import pytest

    with pytest.raises(Exception):
        inf.verify_weights()


def test_draw_predictions_runs():
    img = np.zeros((64, 64, 3), np.float32)
    pred = dict(
        bboxes=[[4, 4, 30, 30]], scores=[0.9], labels=[0],
        masks=np.zeros((1, 64, 64), bool),
    )
    pred["masks"][0, 5:20, 5:20] = True
    out = draw_predictions(img, pred)
    assert out.shape == (64, 64, 3)
    assert out.max() > 0  # something was drawn


def test_flat_transfer_matches_bits():
    """mask_transfer='flat' (det fields + mask bits in ONE buffer, one
    transfer round-trip per batch, pipelined across chunks) must produce
    identical predictions to 'bits'."""
    tiny = {
        "type": "RSPrompterAnchor", "num_classes": 1, "image_size": 64,
        "vision_config": dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=8, window_size=4,
            global_attn_indexes=(1,), output_channels=32,
        ),
        "select_layers": (1, 2), "aggregator_hidden": 8,
        "rpn_strides": (2, 4, 8, 16, 32), "roi_strides": (2, 4, 8, 16),
        "prompt_shape": (10, 3),
        "test_cfg": dict(
            rpn=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
            rcnn=dict(score_thr=0.0, max_per_img=4),
        ),
    }
    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (50, 60, 3)).astype(np.float32)
            for _ in range(3)]  # 2 chunks at batch_size=2 -> pipelining runs
    cfg = {"model": tiny, "crop_size": (64, 64)}
    from rsprompter_tpu.core.config import Config

    preds = {}
    for mode in ("bits", "flat"):
        inf = DetInferencer(
            Config.fromdict(cfg), batch_size=2, mask_transfer=mode
        )
        preds[mode] = inf(imgs)["predictions"]
    assert len(preds["flat"]) == len(preds["bits"]) == 3
    for pf, pb in zip(preds["flat"], preds["bits"]):
        np.testing.assert_array_equal(pf["bboxes"], pb["bboxes"])
        np.testing.assert_array_equal(pf["scores"], pb["scores"])
        np.testing.assert_array_equal(pf["labels"], pb["labels"])
        np.testing.assert_array_equal(pf["masks"], pb["masks"])
