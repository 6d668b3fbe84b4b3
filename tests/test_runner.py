"""Integration: Runner trains a tiny model on real NWPU data, checkpoints,
resumes, and validates with CocoMetric."""

import os

import jax
import numpy as np
import pytest

from rsprompter_tpu.data.coco import NWPUInsSegDataset
from rsprompter_tpu.data.loader import DataLoader
from rsprompter_tpu.data.transforms import build_test_pipeline, build_train_pipeline
from rsprompter_tpu.engine.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from rsprompter_tpu.engine.optim import build_optimizer
from rsprompter_tpu.engine.runner import Runner
from rsprompter_tpu.engine.train_state import TrainState
from rsprompter_tpu.models.detectors.rsprompter_anchor import RSPrompterAnchor
from rsprompter_tpu.models.sam.configs import SamVisionConfig

NWPU_ROOT = "/root/reference/data/NWPU"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(NWPU_ROOT), reason="NWPU data not available"
)

TINY_VISION = SamVisionConfig(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    image_size=64, patch_size=8, window_size=4, global_attn_indexes=(1,),
    output_channels=32,
)


def _model():
    return RSPrompterAnchor(
        vision_config=TINY_VISION, image_size=64, num_classes=10,
        prompt_shape=(10, 3), select_layers=(1, 2), aggregator_hidden=8,
        rpn_strides=(2, 4, 8, 16, 32), roi_strides=(2, 4, 8, 16),
        num_samples=16, pos_fraction=0.25,
        train_cfg=dict(rpn=dict(num=16),
                       rpn_proposal=dict(nms_pre=50, max_per_img=20, pre_nms_total=60)),
        test_cfg=dict(rpn=dict(nms_pre=50, max_per_img=20, pre_nms_total=60),
                      rcnn=dict(score_thr=0.0, max_per_img=5)),
    )


def test_runner_trains_validates_and_resumes(tmp_path):
    train_ds = NWPUInsSegDataset(
        ann_file="annotations/NWPU_instances_train.json", data_root=NWPU_ROOT,
        data_prefix=dict(img="imgs"),
        pipeline=build_train_pipeline((64, 64), rng=np.random.RandomState(0)),
        indices=4,
    )
    val_ds = NWPUInsSegDataset(
        ann_file="annotations/NWPU_instances_val.json", data_root=NWPU_ROOT,
        data_prefix=dict(img="imgs"),
        pipeline=build_test_pipeline((64, 64)), test_mode=True, indices=2,
    )
    train_loader = DataLoader(train_ds, batch_size=2, max_gt=16, pad_shape=(64, 64))
    val_loader = DataLoader(val_ds, batch_size=2, max_gt=16, pad_shape=(64, 64),
                            drop_last=False, shuffle=False)

    model = _model()
    batch_np, _ = next(iter(train_loader))
    from rsprompter_tpu.ops.masks import unpack_batch_masks

    batch = unpack_batch_masks(
        {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    )
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-3, total_steps=10,
        freeze_paths=["backbone"],
    )
    state = TrainState.create(variables["params"], variables.get("batch_stats"), tx)
    runner = Runner(
        model, tx, train_loader, val_loader, val_ds,
        work_dir=str(tmp_path), max_epochs=1, val_interval=1, log_interval=1,
        num_classes=10,
    )
    state = runner.train(state)
    assert int(state.step) == 2  # 4 imgs / bs 2
    assert os.path.exists(tmp_path / "metrics.jsonl")
    # a checkpoint was written and can resume
    ckpt = latest_checkpoint(str(tmp_path / "ckpts"))
    assert ckpt is not None
    restored = restore_checkpoint(ckpt, state)
    assert int(restored.step) == 2
    # validation metrics were computed (values near 0 for a random model)
    lines = open(tmp_path / "metrics.jsonl").read()
    assert "coco/bbox_mAP" in lines


def test_vis_backends(tmp_path):
    """LocalVisBackend JSONL + WandbVisBackend offline fallback."""
    from rsprompter_tpu.engine.vis_backend import build_vis_backends

    backends = build_vis_backends(
        [dict(type="LocalVisBackend"),
         dict(type="WandbVisBackend",
              init_kwargs=dict(project="rsprompter-whu", group="anchor"))],
        str(tmp_path),
    )
    for b in backends:
        b.log_scalars({"loss": 1.5, "iter": 10}, step=10)
        b.close()
    import json as _json
    local = [_json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert local[0]["loss"] == 1.5
    offline = list((tmp_path / "wandb").glob("*.jsonl"))
    assert offline, "wandb fallback file missing"
    recs = [_json.loads(l) for l in open(offline[0])]
    assert recs[0]["_meta"]["project"] == "rsprompter-whu"
    assert any(r.get("loss") == 1.5 for r in recs)


def test_cache_train_batches_uploads_once(tmp_path):
    """cache_train_batches: batch_fn (host->device upload) runs only during
    the first epoch; later epochs reuse device arrays (flat-RSS root fix)."""
    train_ds = NWPUInsSegDataset(
        ann_file="annotations/NWPU_instances_train.json", data_root=NWPU_ROOT,
        data_prefix=dict(img="imgs"),
        pipeline=build_test_pipeline((64, 64)),  # deterministic (no aug)
        indices=4,
    )
    train_loader = DataLoader(train_ds, batch_size=2, max_gt=16, pad_shape=(64, 64))
    model = _model()
    batch_np, _ = next(iter(train_loader))
    from rsprompter_tpu.ops.masks import unpack_batch_masks

    batch = unpack_batch_masks(
        {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, jax.random.PRNGKey(1),
        method="loss",
    )
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-3, total_steps=30,
        freeze_paths=["backbone"],
    )
    state = TrainState.create(variables["params"], variables.get("batch_stats"), tx)
    uploads = []

    def counting_batch_fn(b):
        uploads.append(1)
        return unpack_batch_masks({k: jax.numpy.asarray(v) for k, v in b.items()})

    runner = Runner(
        model, tx, train_loader, work_dir=str(tmp_path),
        max_epochs=3, val_interval=100, log_interval=100, num_classes=10,
        batch_fn=counting_batch_fn, cache_train_batches=True,
    )
    state = runner.train(state)
    assert int(state.step) == 6  # 2 batches x 3 epochs
    assert len(uploads) == 2  # uploaded only in epoch 0
