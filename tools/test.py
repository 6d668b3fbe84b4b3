#!/usr/bin/env python
"""Evaluate a detector: ``python tools/test.py CONFIG [CKPT] [--cfg-options ...]``.

CLI parity with the reference's ``tools/test.py`` (COCO bbox+segm mAP).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--cfg-options", nargs="+", default=None)
    p.add_argument("--tta", action="store_true",
                   help="horizontal-flip test-time augmentation "
                        "(reference tools/test.py --tta / DetTTAModel)")
    p.add_argument("--oracle", action="store_true",
                   help="SAM-det oracle mode (GT boxes as prompts)")
    p.add_argument("--show-dir", default=None,
                   help="dump rendered prediction overlays to this directory "
                        "(reference tools/test.py:46-55 --show-dir)")
    p.add_argument("--corruption", default=None,
                   help="apply this image corruption before the pipeline "
                        "(robustness benchmark; see data/corruptions.py)")
    p.add_argument("--severity", type=int, default=1, choices=range(1, 6))
    p.add_argument("--classwise", action="store_true",
                   help="also report per-category AP (reference "
                        "CocoMetric(classwise=True))")
    p.add_argument("--out", default=None,
                   help="dump every (prediction, GT) pair as self-contained "
                        "JSON for offline re-evaluation via "
                        "tools/analysis_tools/eval_metric.py (reference "
                        "tools/test.py --out)")
    args = p.parse_args()
    if args.tta and args.oracle:
        p.error("--tta and --oracle are mutually exclusive: the TTA wrapper "
                "always runs method='predict', which would silently ignore "
                "--oracle")
    return args


def _dump_overlays(show_dir, metas, dets, probs, classes, score_thr=0.3):
    """Render per-image prediction overlays during eval (reference
    ``tools/test.py --show-dir`` / DetVisualizationHook)."""
    import cv2
    import numpy as np

    from rsprompter_tpu.apis.inferencer import draw_predictions
    from rsprompter_tpu.ops.masks import finalize_masks_np

    os.makedirs(show_dir, exist_ok=True)
    for i, meta in enumerate(metas):
        if meta.get("img_id", -1) == -1:
            continue
        img = cv2.imread(meta["img_path"])
        if img is None:
            continue
        keep = np.asarray(dets.valid[i]) & (np.asarray(dets.scores[i]) > score_thr)
        ws, hs = meta["scale_factor"]
        pred = dict(
            bboxes=(np.asarray(dets.boxes[i])[keep]
                    / np.array([ws, hs, ws, hs])).tolist(),
            scores=np.asarray(dets.scores[i])[keep].tolist(),
            labels=np.asarray(dets.labels[i])[keep].tolist(),
            masks=finalize_masks_np(
                probs[i][keep], meta["batch_input_shape"],
                meta["ori_shape"], meta["scale_factor"],
            ),
        )
        name = os.path.basename(meta.get("img_path", f"img_{meta['img_id']}.jpg"))
        cv2.imwrite(
            os.path.join(show_dir, name),
            draw_predictions(img.astype(np.float32), pred, classes=classes),
        )


def main():
    from rsprompter_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    args = parse_args()
    import jax

    # the axon sitecustomize force-pins the platform; this env knob lets
    # wrappers (tests, verify_parity.sh) redirect the CLI to cpu in-process
    if os.environ.get("RSPROMPTER_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["RSPROMPTER_PLATFORM"])
    import numpy as np

    from rsprompter_tpu.apis.build import build_detector
    from rsprompter_tpu.core.config import Config
    from rsprompter_tpu.core.registry import DATASETS
    from rsprompter_tpu.data import coco as _coco  # registers datasets
    from rsprompter_tpu.data.loader import DataLoader
    from rsprompter_tpu.data.transforms import build_test_pipeline
    from rsprompter_tpu.engine.checkpoint import (
        load_sam_pretrained,
        restore_checkpoint,
    )
    from rsprompter_tpu.evaluation.coco_metric import CocoMetric, gt_from_raw_sample
    from rsprompter_tpu.utils.torch_convert import load_torch_checkpoint

    from rsprompter_tpu.parallel.mesh import mesh_from_config

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(args.cfg_options)
    crop = tuple(cfg.get("crop_size", (1024, 1024)))
    model = build_detector(cfg.model)

    # shard eval over every visible device (dist_test.sh replacement);
    # config batch_size is per-device
    mesh, tp_rules, _ = mesh_from_config(cfg.get("dist"))
    n_data = mesh.shape["data"] if mesh is not None else 1

    ds_cfg = dict((cfg.get("test_dataloader") or cfg.val_dataloader)["dataset"])
    pipeline = build_test_pipeline(crop)
    if args.corruption:
        from rsprompter_tpu.data.corruptions import CorruptImage

        pipeline = [CorruptImage(args.corruption, args.severity)] + pipeline
    ds_cfg["pipeline"] = pipeline
    dataset = DATASETS.build(ds_cfg)
    loader = DataLoader(
        dataset,
        batch_size=cfg.get("val_dataloader", {}).get("batch_size", 2) * n_data,
        shuffle=False, drop_last=False, max_gt=cfg.get("max_gt", 100),
        pad_shape=crop,
    )

    batch_np, _ = next(iter(loader))
    batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, batch, method="predict")
    )()

    sam_ckpt = cfg.model.get("hf_sam_pretrain_ckpt_path") or cfg.model.get(
        "sam_checkpoint"
    )
    if sam_ckpt and os.path.exists(sam_ckpt):
        sd = load_torch_checkpoint(sam_ckpt)
        params, _ = load_sam_pretrained(
            variables["params"], sd, cfg.model["type"]
        )
        variables = {**variables, "params": params}
    if args.checkpoint:
        if args.checkpoint.endswith((".pth", ".bin", ".safetensors")):
            # reference-trained mmengine checkpoint
            from rsprompter_tpu.engine.checkpoint import load_reference_checkpoint

            sd = load_torch_checkpoint(args.checkpoint)
            params, _ = load_reference_checkpoint(variables["params"], sd)
            variables = {**variables, "params": params}
        else:
            # orbax train-state checkpoint (structure-free full-tree restore)
            from rsprompter_tpu.engine.checkpoint import restore_train_params

            params, bstats = restore_train_params(args.checkpoint)
            variables = {**variables, "params": params}
            if bstats is not None:
                variables["batch_stats"] = bstats

    method = "oracle_predict" if args.oracle else "predict"
    if args.tta:
        from rsprompter_tpu.models.tta import make_tta_predict

        tcfg = dict(cfg.model.get("test_cfg", {}) or {}).get("rcnn", {})
        tta_fn = make_tta_predict(
            model,
            iou_thr=tcfg.get("nms_iou_thr", 0.5),
            max_per_img=tcfg.get("max_per_img", 100),
        )
    from rsprompter_tpu.ops.masks import quantize_probs_u8

    def _raw_predict(v, b):
        if args.tta:
            dets, probs = tta_fn(v, b)
        else:
            dets, probs = model.apply(v, b, method=method)
        # uint8 transfer of mask probs (4x less device->host traffic);
        # host side dequantizes via probs_to_f32/finalize_masks_np
        return dets, quantize_probs_u8(probs)

    if mesh is not None:
        from rsprompter_tpu.parallel.mesh import batch_shardings, param_shardings

        v_sh = {
            k: param_shardings(v, mesh, tp_rules if k == "params" else ())
            for k, v in variables.items()
        }
        b_sh = batch_shardings(batch, mesh)
        variables = jax.device_put(variables, v_sh)
        predict = jax.jit(_raw_predict, in_shardings=(v_sh, b_sh))
    else:
        predict = jax.jit(_raw_predict)
    from rsprompter_tpu.utils.memory import oom_guard

    predict = oom_guard(predict)  # AvoidOOM analogue: halve batch on OOM

    id_to_idx = {d["img_id"]: i for i, d in enumerate(dataset.data_list)}
    classes = (dataset.metainfo or {}).get("classes")
    metric = CocoMetric(
        num_classes=cfg.model.get("num_classes", 1), dump_path=args.out,
        classwise=args.classwise, class_names=classes,
    )
    for batch_np, metas in loader:
        batch = {k: jax.numpy.asarray(v) for k, v in batch_np.items()}
        dets, mask_probs = predict(variables, batch)
        gts = [
            gt_from_raw_sample(dataset.load_raw(id_to_idx[m["img_id"]]))
            if m.get("img_id", -1) != -1 else None
            for m in metas
        ]
        dets_np = jax.device_get(dets)
        probs_np = np.asarray(mask_probs)
        metric.process(metas, dets_np, probs_np, gts)
        if args.show_dir:
            _dump_overlays(args.show_dir, metas, dets_np, probs_np, classes)
    results = metric.compute()
    for k, v in results.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
