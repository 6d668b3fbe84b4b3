"""Box ops: IoU, delta coding, format conversion (pure XLA, static shapes).

Behavior parity: reference ``mmdet/structures/bbox/`` horizontal-box utils and
``DeltaXYWHBBoxCoder`` (reference
``mmdet/models/task_modules/coders/delta_xywh_bbox_coder.py:15``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bbox_overlaps(
    boxes1: jax.Array, boxes2: jax.Array, mode: str = "iou", eps: float = 1e-6
) -> jax.Array:
    """Pairwise IoU/IoF: boxes (N,4) xyxy, (M,4) -> (N,M)."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    if mode == "iou":
        union = area1[:, None] + area2[None, :] - inter
    elif mode == "iof":
        union = area1[:, None] * jnp.ones_like(area2)[None, :]
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(union, eps)


def bbox_cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def bbox_xyxy_to_cxcywh(b: jax.Array) -> jax.Array:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def clip_boxes(boxes: jax.Array, img_shape: Tuple[int, int]) -> jax.Array:
    """Clip xyxy boxes to [0, W] x [0, H]."""
    h, w = img_shape
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_area(boxes: jax.Array) -> jax.Array:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_center(boxes: jax.Array) -> jax.Array:
    return jnp.stack(
        [(boxes[..., 0] + boxes[..., 2]) / 2, (boxes[..., 1] + boxes[..., 3]) / 2],
        axis=-1,
    )


class DeltaXYWHBBoxCoder:
    """(dx, dy, dw, dh) box regression coding with target normalization.

    decode clamps dw/dh at ``log(wh_ratio_clip)`` and optionally clips decoded
    boxes to the image, matching the reference coder's defaults.
    """

    def __init__(
        self,
        target_means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
        target_stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
        clip_border: bool = True,
    ):
        self.means = np.asarray(target_means, np.float32)
        self.stds = np.asarray(target_stds, np.float32)
        self.clip_border = clip_border

    def encode(self, boxes: jax.Array, gt: jax.Array) -> jax.Array:
        """boxes (..., 4) proposals, gt (..., 4) targets -> deltas (..., 4)."""
        eps = 1e-6
        pw = jnp.maximum(boxes[..., 2] - boxes[..., 0], eps)
        ph = jnp.maximum(boxes[..., 3] - boxes[..., 1], eps)
        px = (boxes[..., 0] + boxes[..., 2]) * 0.5
        py = (boxes[..., 1] + boxes[..., 3]) * 0.5
        gw = jnp.maximum(gt[..., 2] - gt[..., 0], eps)
        gh = jnp.maximum(gt[..., 3] - gt[..., 1], eps)
        gx = (gt[..., 0] + gt[..., 2]) * 0.5
        gy = (gt[..., 1] + gt[..., 3]) * 0.5
        deltas = jnp.stack(
            [(gx - px) / pw, (gy - py) / ph, jnp.log(gw / pw), jnp.log(gh / ph)],
            axis=-1,
        )
        return (deltas - self.means) / self.stds

    def decode(
        self,
        boxes: jax.Array,
        deltas: jax.Array,
        max_shape: Optional[Tuple[int, int]] = None,
        wh_ratio_clip: float = 16 / 1000,
    ) -> jax.Array:
        deltas = deltas * self.stds + self.means
        dx, dy, dw, dh = (
            deltas[..., 0], deltas[..., 1], deltas[..., 2], deltas[..., 3]
        )
        max_ratio = float(np.abs(np.log(wh_ratio_clip)))
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
        pw = boxes[..., 2] - boxes[..., 0]
        ph = boxes[..., 3] - boxes[..., 1]
        px = (boxes[..., 0] + boxes[..., 2]) * 0.5
        py = (boxes[..., 1] + boxes[..., 3]) * 0.5
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gx = px + pw * dx
        gy = py + ph * dy
        out = jnp.stack(
            [gx - gw * 0.5, gy - gh * 0.5, gx + gw * 0.5, gy + gh * 0.5], axis=-1
        )
        if self.clip_border and max_shape is not None:
            out = clip_boxes(out, max_shape)
        return out
