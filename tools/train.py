#!/usr/bin/env python
"""Train a detector from a config file.

CLI parity with the reference's ``tools/train.py``:
  python tools/train.py CONFIG [--work-dir D] [--resume] \
      [--cfg-options k=v ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--amp", action="store_true", help="bf16 compute")
    p.add_argument(
        "--cfg-options", nargs="+", default=None,
        help="dotted config overrides: key=value",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from rsprompter_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax

    # the axon sitecustomize force-pins the platform; this env knob lets
    # wrappers (tests, verify_parity.sh) redirect the CLI to cpu in-process
    if os.environ.get("RSPROMPTER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RSPROMPTER_PLATFORM"])

    from rsprompter_tpu.apis.build import build_detector, freeze_paths_for
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.core.registry import DATASETS
    from rsprompter_tpu.data import coco as _coco  # registers datasets
    from rsprompter_tpu.data.loader import DataLoader
    from rsprompter_tpu.data.transforms import (
        build_test_pipeline,
        build_train_pipeline,
    )
    from rsprompter_tpu.engine.checkpoint import load_sam_pretrained
    from rsprompter_tpu.ops.masks import unpack_batch_masks
    from rsprompter_tpu.engine.optim import build_optimizer, warmup_cosine_schedule
    from rsprompter_tpu.engine.runner import Runner
    from rsprompter_tpu.engine.vis_backend import build_vis_backends
    from rsprompter_tpu.engine.train_state import TrainState
    from rsprompter_tpu.utils.torch_convert import load_torch_checkpoint

    from rsprompter_tpu.parallel.mesh import mesh_from_config

    # multi-host: one process per host (tools/pod_train.sh); no-op single
    # host. MUST run before any other backend touch. Raises (no silent
    # single-host degradation) when coordinator env/args are present.
    from rsprompter_tpu.parallel.distributed import initialize, process_info

    initialize()

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    if args.amp:
        cfg.model["bf16"] = True
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dirs/default")

    crop = tuple(cfg.get("crop_size", (1024, 1024)))
    model = build_detector(cfg.model)

    # distributed: shard over every visible device (the dist_train.sh
    # replacement — reference tools/dist_train.sh / --launcher). batch_size
    # in the config is PER-DEVICE, as with the reference's per-GPU loaders.
    mesh, tp_rules, zero = mesh_from_config(cfg.get("dist"))
    n_data = mesh.shape["data"] if mesh is not None else 1
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)} (zero={zero}, tp_rules={bool(tp_rules)})")
    pinfo = process_info()
    n_proc = pinfo["process_count"]
    if n_proc > 1:
        print(f"multi-host: {pinfo}")
        assert mesh is not None, "multi-host run requires a device mesh"

    train_ds_cfg = dict(cfg.train_dataloader["dataset"])
    # train_aug=False -> deterministic resize/pad pipeline (overfit/debug runs)
    train_ds_cfg["pipeline"] = (
        build_train_pipeline(crop)
        if cfg.get("train_aug", True)
        else build_test_pipeline(crop)
    )
    train_ds = DATASETS.build(train_ds_cfg)
    # per-host loaders: each host loads 1/n_proc of the global batch
    # (DataLoader shard_id/num_shards = the DistSampler analogue); batch_fn
    # stitches the shards into globally-sharded arrays for the pjit step
    shard_kw = dict(shard_id=pinfo["process_index"], num_shards=n_proc)
    train_loader = DataLoader(
        train_ds,
        batch_size=cfg.train_dataloader.get("batch_size", 2) * n_data // n_proc,
        shuffle=True,
        max_gt=cfg.get("max_gt", 100),
        pad_shape=crop,
        prefetch=2 if cfg.train_dataloader.get("num_workers", 0) > 0 else 0,
        **shard_kw,
    )
    val_loader = val_ds = None
    if cfg.get("val_dataloader"):
        val_ds_cfg = dict(cfg.val_dataloader["dataset"])
        val_ds_cfg["pipeline"] = build_test_pipeline(crop)
        val_ds = DATASETS.build(val_ds_cfg)
        val_loader = DataLoader(
            val_ds,
            batch_size=cfg.val_dataloader.get("batch_size", 2) * n_data // n_proc,
            shuffle=False, drop_last=False,
            max_gt=cfg.get("max_gt", 100), pad_shape=crop,
            **shard_kw,
        )
    batch_fn = None
    if n_proc > 1:
        from rsprompter_tpu.parallel.distributed import local_batch_to_global

        batch_fn = lambda b: local_batch_to_global(b, mesh)  # noqa: E731

    # init params
    batch_np, _ = next(iter(train_loader))
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(cfg.get("seed", 0))},
            unpack_batch_masks(batch), jax.random.PRNGKey(1), method="loss",
        )
    )()
    params = variables["params"]

    ckpt_path = cfg.model.get("hf_sam_pretrain_ckpt_path") or cfg.model.get(
        "sam_checkpoint"
    )
    if ckpt_path and os.path.exists(ckpt_path):
        sd = load_torch_checkpoint(ckpt_path)
        params, report = load_sam_pretrained(params, sd, cfg.model["type"])
        print(f"loaded SAM pretrain from {ckpt_path}: {report}")
    elif ckpt_path:
        print(f"WARNING: SAM checkpoint {ckpt_path} not found; random init")

    # reference NumClassCheckHook: config classes must match the dataset
    n_cls = cfg.model.get("num_classes", 1)
    ds_cls = len(train_ds.metainfo.get("classes", ()))
    if ds_cls and ds_cls != n_cls:
        raise ValueError(
            f"model.num_classes={n_cls} != dataset classes={ds_cls} "
            f"({train_ds.metainfo['classes']})"
        )

    base_lr = cfg.get("base_lr", 1e-4)
    # reference auto_scale_lr: linear scaling by GLOBAL batch size
    asl = cfg.get("auto_scale_lr") or {}
    if asl.get("enable"):
        global_bs = cfg.train_dataloader.get("batch_size", 2) * n_data
        base_lr = base_lr * global_bs / asl.get("base_batch_size", global_bs)
        print(f"auto_scale_lr: lr -> {base_lr}")

    max_epochs = cfg.get("max_epochs", 12)
    steps_per_epoch = max(len(train_loader), 1)
    freeze, override = freeze_paths_for(cfg.model)
    sched = warmup_cosine_schedule(
        base_lr, max_epochs * steps_per_epoch, cfg.get("warmup_iters", 50)
    )
    tx, _ = build_optimizer(
        params,
        base_lr=base_lr,
        weight_decay=cfg.get("weight_decay", 0.05),
        total_steps=max_epochs * steps_per_epoch,
        warmup_steps=cfg.get("warmup_iters", 50),
        freeze_paths=freeze,
        train_paths_override=override,
        schedule=sched,
        grad_clip=cfg.get("grad_clip"),
    )
    state = TrainState.create(params, variables.get("batch_stats"), tx)

    make_step = None
    if mesh is not None:
        from rsprompter_tpu.engine.train_state import make_sharded_train_step

        make_step, state = make_sharded_train_step(
            model, tx, mesh, state, batch, tp_rules=tp_rules, zero=zero
        )

    runner = Runner(
        model, tx, train_loader, val_loader, val_ds,
        work_dir=work_dir,
        max_epochs=max_epochs,
        val_interval=cfg.get("val_interval", 3),
        ckpt_interval=cfg.get("ckpt_interval", 1),
        log_interval=cfg.get("log_interval", 20),
        num_classes=cfg.model.get("num_classes", 1),
        make_step=make_step,
        mesh=mesh,
        tp_rules=tp_rules,
        lr_schedule=sched,
        vis_backends=build_vis_backends(cfg.get("vis_backends"), work_dir),
        batch_fn=batch_fn,
        # only legal with the deterministic pipeline (train_aug=False)
        cache_train_batches=cfg.get("cache_train_batches", False)
        and not cfg.get("train_aug", True),
    )
    runner.train(state, resume=args.resume)


if __name__ == "__main__":
    main()
