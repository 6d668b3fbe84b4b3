"""FCN mask head + RoI mask targets + paste utilities.

Behavior parity: reference
``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:29`` (the SAM-seg
Mask R-CNN baseline head): 4x 3x3 convs -> 2x deconv -> 1x1 cls; 28^2 RoI
targets cropped from GT masks; sigmoid + RoI-paste at predict.

TPU re-design: mask targets are produced by running the RoIAlign gather over
the GT-mask stack (no per-RoI python loops, no dynamic shapes); RoI-paste to
full resolution happens host-side at eval (device keeps 28^2 logits).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rsprompter_tpu.models.sam.common import FastConvTranspose2x2
import numpy as np

from rsprompter_tpu.models.losses import mask_cross_entropy
from rsprompter_tpu.ops.roi_align import roi_align


class FCNMaskHead(nn.Module):
    num_classes: int = 1
    conv_out_channels: int = 256
    num_convs: int = 4
    class_agnostic: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x (R, h, w, C) -> mask logits (R, 2h, 2w, num_classes)."""
        for i in range(self.num_convs):
            x = nn.Conv(
                self.conv_out_channels, (3, 3), padding=1, dtype=self.dtype,
                name=f"convs_{i}_conv",
            )(x)
            x = nn.relu(x)
        x = FastConvTranspose2x2(
            self.conv_out_channels, dtype=self.dtype, name="upsample",
        )(x)
        x = nn.relu(x)
        out_ch = 1 if self.class_agnostic else self.num_classes
        x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="conv_logits")(x)
        return x


def mask_targets_from_rois(
    gt_masks: jax.Array,  # (B, G, H, W) float/uint8
    rois: jax.Array,  # (R, 5) [batch_idx, x1, y1, x2, y2] image coords
    gt_inds: jax.Array,  # (R,) 1-based matched gt index (0 -> invalid)
    mask_size: Tuple[int, int] = (28, 28),
) -> jax.Array:
    """Crop each pos RoI's matched GT mask to ``mask_size`` (binarized >=0.5)."""
    b, g, h, w = gt_masks.shape
    flat = gt_masks.reshape(b * g, h, w, 1).astype(jnp.float32)
    flat_idx = rois[:, 0].astype(jnp.int32) * g + jnp.clip(gt_inds - 1, 0, g - 1)
    rois_flat = jnp.concatenate(
        [flat_idx[:, None].astype(rois.dtype), rois[:, 1:]], axis=1
    )
    crops = roi_align(flat, rois_flat, mask_size, 1.0, sampling_ratio=2, aligned=False)
    return (crops[..., 0] >= 0.5).astype(jnp.float32)


def fcn_mask_loss(
    mask_logits: jax.Array,  # (R, S, S, C) or (R, S, S, 1)
    mask_targets: jax.Array,  # (R, S, S)
    labels: jax.Array,  # (R,)
    pos_valid: jax.Array,  # (R,) bool
    class_agnostic: bool = False,
) -> jax.Array:
    if class_agnostic:
        logits = mask_logits[..., 0]
    else:
        idx = jnp.clip(labels, 0, mask_logits.shape[-1] - 1)
        logits = jnp.take_along_axis(
            mask_logits, idx[:, None, None, None], axis=-1
        )[..., 0]
    return mask_cross_entropy(logits, mask_targets, valid=pos_valid)


def paste_masks_np(
    masks: np.ndarray,  # (N, S, S) sigmoid probabilities
    boxes: np.ndarray,  # (N, 4) xyxy in target image coords
    img_h: int,
    img_w: int,
    thr: float = 0.5,
) -> np.ndarray:
    """Host-side RoI paste (numpy), mirroring mmdet's _do_paste_mask."""
    n = len(masks)
    out = np.zeros((n, img_h, img_w), dtype=bool)
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        x1i, y1i = max(x1i, 0), max(y1i, 0)
        x2i, y2i = min(x2i, img_w), min(y2i, img_h)
        if x2i <= x1i or y2i <= y1i:
            continue
        ys = (np.arange(y1i, y2i) + 0.5 - y1) / max(y2 - y1, 1e-6) * masks.shape[1] - 0.5
        xs = (np.arange(x1i, x2i) + 0.5 - x1) / max(x2 - x1, 1e-6) * masks.shape[2] - 0.5
        ys0 = np.clip(np.floor(ys).astype(int), 0, masks.shape[1] - 1)
        xs0 = np.clip(np.floor(xs).astype(int), 0, masks.shape[2] - 1)
        ys1 = np.clip(ys0 + 1, 0, masks.shape[1] - 1)
        xs1 = np.clip(xs0 + 1, 0, masks.shape[2] - 1)
        wy = np.clip(ys - ys0, 0, 1)[:, None]
        wx = np.clip(xs - xs0, 0, 1)[None, :]
        m = masks[i]
        patch = (
            m[ys0[:, None], xs0[None, :]] * (1 - wy) * (1 - wx)
            + m[ys0[:, None], xs1[None, :]] * (1 - wy) * wx
            + m[ys1[:, None], xs0[None, :]] * wy * (1 - wx)
            + m[ys1[:, None], xs1[None, :]] * wy * wx
        )
        out[i, y1i:y2i, x1i:x2i] = patch >= thr
    return out
