"""Test-time augmentation: horizontal-flip TTA for any detector.

Reference behavior: ``DetTTAModel`` (`/root/reference/mmdet/models/test_time_augs/det_tta.py:14`)
driven by ``tools/test.py --tta`` (`/root/reference/tools/test.py:95+`):
predict on the identity and the horizontally flipped image, map the flipped
detections back, concatenate, and run per-class NMS over the union keeping
the top ``max_per_img``.

The reference pipeline flips BEFORE padding (resize -> flip -> pad), so the
flipped image is still padded bottom-right. Our batches are already padded,
so the flip mirrors the full canvas and then ROLLS each image left by its
pad width — valid pixels land mirrored at [0, w_valid) with the padding back
on the right, exactly the distribution the model trained on. Masks roll at
their raster stride (rounding the pad to the nearest mask pixel, <= stride/2
input px of error on flipped-view masks — NMS-selected boxes are exact).

TPU-first: both views run through the same jitted predict, the merge is a
masked static-shape batched NMS, per-image shifts are traced rolls — no host
logic, one compilation.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from rsprompter_tpu.models.roi_heads.bbox_head import DetResult
from rsprompter_tpu.ops.nms import batched_nms


def hflip_batch(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Mirror each image's VALID region inside the padded canvas (flip the
    canvas, then roll the padding back to the right edge)."""
    images = batch["images"]
    w_pad = images.shape[2]
    w_valid = batch["img_shape"][:, 1]  # (B,)

    def one(im, wv):
        return jnp.roll(im[:, ::-1, :], wv - w_pad, axis=1)

    out = dict(batch)
    out["images"] = jax.vmap(one)(images, w_valid)
    return out


def make_tta_predict(
    model, *, iou_thr: float = 0.5, max_per_img: int = 100
) -> Callable:
    """Build a jittable flip-TTA predict: (variables, batch) -> (DetResult,
    mask_probs), output shapes identical to plain predict."""

    def predict(variables, batch):
        dets_i, probs_i = model.apply(variables, batch, method="predict")
        dets_f, probs_f = model.apply(variables, hflip_batch(batch), method="predict")

        w_valid = batch["img_shape"][:, 1].astype(dets_f.boxes.dtype)  # (B,)
        wv = w_valid[:, None]
        bx = dets_f.boxes
        boxes_f = jnp.stack(
            [wv - bx[..., 2], bx[..., 1], wv - bx[..., 0], bx[..., 3]],
            axis=-1,
        )
        # masks: mirror the raster, then roll the (mirrored) pad back right
        w_mask = probs_f.shape[-1]
        stride = batch["images"].shape[2] / w_mask
        shift = jnp.round(w_valid / stride).astype(jnp.int32) - w_mask  # (B,)
        probs_f = jax.vmap(lambda p, s: jnp.roll(p[..., ::-1], s, axis=-1))(
            probs_f, shift
        )

        boxes = jnp.concatenate([dets_i.boxes, boxes_f], axis=1)
        scores = jnp.concatenate([dets_i.scores, dets_f.scores], axis=1)
        labels = jnp.concatenate([dets_i.labels, dets_f.labels], axis=1)
        valid = jnp.concatenate([dets_i.valid, dets_f.valid], axis=1)
        probs = jnp.concatenate([probs_i, probs_f], axis=1)

        def merge_one(bx, sc, lb, vd, pr):
            idx, keep, out_boxes, out_scores = batched_nms(
                bx, sc, lb, iou_thr=iou_thr, max_out=max_per_img, valid=vd
            )
            return DetResult(out_boxes, out_scores, lb[idx], keep), pr[idx]

        return jax.vmap(merge_one)(boxes, scores, labels, valid, probs)

    return predict
