"""Training/eval runner: the thin replacement for the mmengine Runner.

Covers the reference's EpochBasedTrainLoop + ValLoop + hooks surface
(SURVEY §3.1-3.2): epoch loop, per-iter logging with smoothed it/s
(LogProcessor window), periodic validation with CocoMetric, checkpoint
save/best/resume, finite-loss guard (the checkloss-hook analogue), and
optional W&B-style JSONL metric logs in ``work_dir``.
"""

from __future__ import annotations

import gc
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from rsprompter_tpu.data.loader import DataLoader
from rsprompter_tpu.engine.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from rsprompter_tpu.engine.train_state import TrainState
from rsprompter_tpu.evaluation.coco_metric import CocoMetric, gt_from_raw_sample
from rsprompter_tpu.ops.masks import quantize_probs_u8


def _host_rss_mb() -> float:
    """Resident set size in MB (psutil-free: /proc/self/statm)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return round(pages * os.sysconf("SC_PAGE_SIZE") / 1e6, 1)
    except Exception:
        return -1.0


class Runner:
    def __init__(
        self,
        model,
        tx,
        train_loader: DataLoader,
        val_loader: Optional[DataLoader] = None,
        val_dataset=None,
        work_dir: str = "./work_dir",
        max_epochs: int = 12,
        val_interval: int = 3,
        ckpt_interval: int = 1,
        log_interval: int = 20,
        num_classes: int = 1,
        seed: int = 0,
        make_step=None,
        predict_fn=None,
        vis_interval: int = 0,  # draw every Nth val image (0 = off); the
        # DetVisualizationHook analogue (reference engine/hooks/visualization_hook.py:19)
        mesh=None,  # jax.sharding.Mesh: shard validate's predict on 'data'
        tp_rules=(),
        lr_schedule=None,  # optax schedule for lr logging (LogProcessor parity)
        vis_backends=None,  # list of LocalVisBackend/WandbVisBackend
        save_best=("coco/bbox_mAP", "coco/segm_mAP"),  # reference
        # _base_/rsprompter_anchor.py:9: save_best on BOTH metrics
        batch_fn=None,  # numpy batch -> device arrays; multi-host runs pass
        # local_batch_to_global so per-host shards stitch into global arrays
        cache_train_batches: bool = False,  # upload each collated batch ONCE
        # (first epoch), then reuse the device arrays with per-epoch order
        # shuffling. Zero per-iter host->device traffic — the root-cause fix
        # for the remote-tunnel host-RSS growth (client-held upload copies,
        # ROADMAP r2 §6) whenever the dataset fits HBM. Only valid with a
        # deterministic pipeline (train_aug=False): batch composition is
        # frozen at epoch 0.
    ):
        self.model = model
        self.tx = tx
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.val_dataset = val_dataset
        self.work_dir = work_dir
        self.max_epochs = max_epochs
        self.val_interval = val_interval
        self.ckpt_interval = ckpt_interval
        self.log_interval = log_interval
        self.num_classes = num_classes
        self.rng = jax.random.PRNGKey(seed)
        os.makedirs(work_dir, exist_ok=True)
        from rsprompter_tpu.engine.vis_backend import LocalVisBackend

        self.vis_backends = (
            list(vis_backends) if vis_backends else [LocalVisBackend(work_dir)]
        )
        self.make_step = make_step
        self.predict_fn = predict_fn
        self.vis_interval = vis_interval
        self.mesh = mesh
        self.tp_rules = tuple(tp_rules)
        self.lr_schedule = lr_schedule
        self.save_best = tuple(save_best)
        self.batch_fn = batch_fn or (
            lambda b: {k: jax.numpy.asarray(v) for k, v in b.items()}
        )
        self.cache_train_batches = cache_train_batches
        self.best_metrics = {k: -1.0 for k in self.save_best}
        self._predict_cache = None  # compiled once, reused across validates

    def _log(self, record: Dict[str, Any]) -> None:
        record = {
            k: (float(v) if isinstance(v, (np.floating, np.ndarray, jax.Array)) else v)
            for k, v in record.items()
        }
        for backend in self.vis_backends:
            backend.log_scalars(record, step=record.get("iter"))
        msg = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        print(msg, flush=True)

    def train(self, state: TrainState, resume: bool = False) -> TrainState:
        from rsprompter_tpu.engine.train_state import make_train_step

        ckpt_dir = os.path.join(self.work_dir, "ckpts")
        if resume:
            path = latest_checkpoint(ckpt_dir)
            if path:
                state = restore_checkpoint(path, state)
                # re-align the sampler's epoch-seeded shuffle with the
                # restored step (the DistSamplerSeedHook analogue, reference
                # _base_/rsprompter_anchor.py:10) so resumed runs see the
                # same data order they would have unresumed
                spe = max(len(self.train_loader), 1)
                self.train_loader.epoch = int(state.step) // spe
                print(f"resumed from {path}")
        step_fn = self.make_step or make_train_step(self.model, self.tx)

        it = int(state.step)
        spe = max(len(self.train_loader), 1)
        start_epoch = min(it // spe, self.max_epochs)
        last_log_t = time.perf_counter()
        last_log_it = it
        device_batches = []  # cache_train_batches: filled during first epoch
        for epoch in range(start_epoch, self.max_epochs):
            if self.cache_train_batches and device_batches:
                order = np.random.RandomState(epoch).permutation(
                    len(device_batches)
                )
                batches = (device_batches[i] for i in order)
            else:

                def _upload():
                    for batch_np, _metas in self.train_loader:
                        b = self.batch_fn(batch_np)
                        if self.cache_train_batches:
                            device_batches.append(b)
                        yield b

                batches = _upload()
            for batch in batches:
                state, metrics = step_fn(state, batch, self.rng)
                it += 1
                if it % self.log_interval == 0:
                    # sync only at log points: a per-step float() would
                    # serialize host<->device every iteration (on the remote
                    # TPU tunnel that costs more than the step itself). The
                    # finite-loss guard therefore fires within log_interval
                    # steps of the bad step, like the reference's
                    # CheckInvalidLossHook (interval-based).
                    rec = dict(epoch=epoch, iter=it)
                    rec.update({k: float(v) for k, v in metrics.items()})
                    if not np.isfinite(rec["loss"]):
                        raise FloatingPointError(
                            f"non-finite loss at iter {it}: {rec}"
                        )
                    now = time.perf_counter()
                    rec["it_per_s"] = (it - last_log_it) / max(
                        now - last_log_t, 1e-9
                    )
                    if self.lr_schedule is not None:
                        rec["lr"] = float(self.lr_schedule(it))
                    rec["rss_mb"] = _host_rss_mb()  # MemoryProfilerHook
                    # analogue (reference engine/hooks/memory_profiler_hook);
                    # watches the uint8-upload fix for flat host RSS
                    last_log_t, last_log_it = now, it
                    self._log(rec)
                    # free dead device-array handles promptly: on the remote
                    # TPU tunnel, delete RPCs for per-iter input batches can
                    # lag behind creation and pile host-side copies (a 60-
                    # epoch NWPU run grew ~24 MB/iter until the OOM killer
                    # fired at 130 GB); collecting at log points keeps the
                    # handle population flat at negligible cost
                    gc.collect()
            if (epoch + 1) % self.ckpt_interval == 0 or epoch == self.max_epochs - 1:
                save_checkpoint(ckpt_dir, state, it)
            if self.val_loader is not None and (epoch + 1) % self.val_interval == 0:
                results = self.validate(state)
                self._log(dict(epoch=epoch, **results))
                # dual-key best checkpointing (reference
                # save_best=['coco/bbox_mAP','coco/segm_mAP'], rule greater)
                for key in self.save_best:
                    val = results.get(key)
                    if val is not None and val > self.best_metrics[key]:
                        self.best_metrics[key] = val
                        tag = key.split("/")[-1]
                        save_checkpoint(
                            os.path.join(self.work_dir, f"best_{tag}"),
                            state, it, keep=1,
                        )
        return state

    def _make_predict(self):
        """Build (once) the jitted predict — batch sharded on 'data' when a
        mesh is configured, so validation scales with the training devices
        (the reference ValLoop runs per-rank + collect; here XLA shards)."""
        if self._predict_cache is not None:
            return self._predict_cache

        def predict(variables, batch):
            dets, probs = self.model.apply(variables, batch, method="predict")
            # uint8 transfer: 4x less device->host traffic for the mask probs
            # (the dominant eval-loop cost on a slow link); dequantized
            # host-side by ops.masks.probs_to_f32/finalize_masks_np
            return dets, quantize_probs_u8(probs)

        if self.mesh is not None:
            from rsprompter_tpu.parallel.mesh import (
                batch_shardings,
                param_shardings,
            )

            cache = {}

            def sharded(variables, batch):
                if "fn" not in cache:  # shardings need the first call's structure
                    v_sh = {
                        k: param_shardings(
                            v, self.mesh, self.tp_rules if k == "params" else ()
                        )
                        for k, v in variables.items()
                    }
                    b_sh = batch_shardings(batch, self.mesh)
                    cache["fn"] = jax.jit(predict, in_shardings=(v_sh, b_sh))
                return cache["fn"](variables, batch)

            self._predict_cache = sharded
        else:
            self._predict_cache = jax.jit(predict)
        # AvoidOOM analogue (reference mmdet/utils/memory.py:78): on
        # RESOURCE_EXHAUSTED, retry the predict with the batch halved
        from rsprompter_tpu.utils.memory import oom_guard

        self._predict_cache = oom_guard(self._predict_cache)
        return self._predict_cache

    def validate(self, state: TrainState) -> Dict[str, float]:
        assert self.val_loader is not None and self.val_dataset is not None
        metric = CocoMetric(num_classes=self.num_classes)
        predict = self.predict_fn or self._make_predict()
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        offset = 0
        n_dets, score_sum, mask_prob_sum = 0, 0.0, 0.0
        for batch_np, metas in self.val_loader:
            batch = self.batch_fn(batch_np)
            dets, mask_probs = predict(variables, batch)
            gts = []
            for meta in metas:
                if meta.get("img_id", -1) == -1:
                    gts.append(None)
                    continue
                idx = self._index_for_img_id(meta["img_id"])
                gts.append(gt_from_raw_sample(self.val_dataset.load_raw(idx)))
            dets_np = jax.device_get(dets)
            probs_np = np.asarray(mask_probs)
            metric.process(metas, dets_np, probs_np, gts)
            # prediction digest: numeric fingerprints of the predict path,
            # logged alongside the COCO metrics. The self-parity regression
            # net (tests/test_regression_net.py) pins these — they move on
            # ANY predict-chain numeric drift, even while a short run's mAP
            # is still 0 and therefore blind to it.
            valid = np.asarray(dets_np.valid, bool)[: len(metas)]
            n_dets += int(valid.sum())
            score_sum += float(np.asarray(dets_np.scores)[: len(metas)][valid].sum())
            if valid.any():
                m = float(probs_np[: len(metas)][valid].mean(dtype=np.float64))
                if probs_np.dtype == np.uint8:  # quantize_probs_u8 transfer
                    m /= 255.0
                mask_prob_sum += m * int(valid.sum())
            if self.vis_interval and offset % self.vis_interval == 0:
                self._visualize(metas[0], dets_np, probs_np, offset)
            offset += len(metas)
        results = metric.compute()
        results["val/num_dets"] = float(n_dets)
        results["val/mean_score"] = score_sum / max(n_dets, 1)
        results["val/mean_mask_prob"] = mask_prob_sum / max(n_dets, 1)
        return results

    def _visualize(self, meta, dets, probs, index: int) -> None:
        try:
            import cv2

            from rsprompter_tpu.apis.inferencer import draw_predictions
            from rsprompter_tpu.ops.masks import finalize_masks_np

            img = cv2.imread(meta["img_path"])
            if img is None:
                return
            keep = np.asarray(dets.valid[0]) & (np.asarray(dets.scores[0]) > 0.3)
            ws, hs = meta["scale_factor"]
            pred = dict(
                bboxes=(np.asarray(dets.boxes[0])[keep]
                        / np.array([ws, hs, ws, hs])).tolist(),
                scores=np.asarray(dets.scores[0])[keep].tolist(),
                labels=np.asarray(dets.labels[0])[keep].tolist(),
                masks=finalize_masks_np(
                    probs[0][keep], meta["batch_input_shape"],
                    meta["ori_shape"], meta["scale_factor"],
                ),
            )
            vis_dir = os.path.join(self.work_dir, "vis")
            os.makedirs(vis_dir, exist_ok=True)
            classes = (self.val_dataset.metainfo or {}).get("classes")
            cv2.imwrite(
                os.path.join(vis_dir, f"val_{index}.jpg"),
                draw_predictions(img.astype(np.float32), pred, classes=classes),
            )
        except Exception as e:  # visualization must never break training
            print(f"vis failed: {e}")

    def _index_for_img_id(self, img_id) -> int:
        if not hasattr(self, "_img_id_to_idx"):
            self._img_id_to_idx = {
                d["img_id"]: i for i, d in enumerate(self.val_dataset.data_list)
            }
        return self._img_id_to_idx[img_id]
