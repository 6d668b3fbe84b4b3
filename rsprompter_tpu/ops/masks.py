"""Mask postprocessing: the resize -> crop-pad -> resize -> threshold chain.

Behavior parity: reference ``RSPrompterAnchorMaskHead._predict_by_feat_single``
(``mmdet/rsprompter/models.py:1746-1784``) and the SAM-det chain
(``models.py:1198-1212``): sigmoid 256^2 masks -> bilinear to
``batch_input_shape`` -> crop the scale-factor-valid region -> bilinear to
``ori_shape`` -> threshold 0.5.

Memory design (SURVEY §7 hard-part #4): the fixed-size upsample to
``batch_input_shape`` runs on device; the per-image variable crop/resize (a
dynamic shape) runs host-side in numpy at eval time only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def unpack_bits(packed: jax.Array, width: int) -> jax.Array:
    """Device-side inverse of ``np.packbits(axis=-1)`` (MSB-first).

    packed: (..., ceil(W/8)) uint8 -> (..., W) float32 in {0, 1}. Batches
    ship masks bit-packed (32x less host->device traffic than fp32 bitmaps);
    the jitted step unpacks them here.
    """
    import jax.numpy as jnp

    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    bits = (packed[..., :, None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)
    return bits[..., :width].astype(jnp.float32)


def unpack_batch_masks(batch: dict) -> dict:
    """Replace ``gt_masks_packed`` with unpacked ``gt_masks`` (no-op if the
    batch already carries raw masks)."""
    if "gt_masks_packed" not in batch:
        return batch
    batch = dict(batch)
    packed = batch.pop("gt_masks_packed")
    width = batch["images"].shape[-2]  # masks are padded to the image width
    batch["gt_masks"] = unpack_bits(packed, width)
    return batch


def quantize_probs_u8(probs: jax.Array) -> jax.Array:
    """Device-side uint8 quantization of sigmoid probs for host transfer.

    The predict outputs' (B, N, 256, 256) fp32 probs dominate device->host
    time on a slow link (52 MB/batch at bs2/N100); rounding to 255 levels is
    lossless for the downstream bilinear-resize -> threshold-0.5 chain up to
    a half-level (~0.002) boundary wobble, and cuts transfer 4x. Host side:
    ``probs_to_f32`` / ``finalize_masks_np`` dequantize automatically.
    """
    import jax.numpy as jnp

    return jnp.round(probs * 255.0).astype(jnp.uint8)


def pack_mask_bits(probs: jax.Array, thr: float = 0.5) -> jax.Array:
    """Device-side threshold + bit-pack for minimum-traffic mask transfer.

    (..., H, W) probs -> (..., H, W/8) uint8, MSB-first (np.packbits layout;
    inverse of ``unpack_bits``). 32x less transfer than fp32. Semantics
    deviation vs the reference chain: thresholding happens at low res BEFORE
    the upsample-to-ori resize, so mask boundaries can differ within the
    bilinear transition band (~1 low-res pixel). Opt-in via
    ``mask_transfer='bits'`` (serving latency mode).
    """
    import jax.numpy as jnp

    bits = (probs >= thr).astype(jnp.uint8)
    *lead, h, w = bits.shape
    bits = bits.reshape(*lead, h, w // 8, 8)
    weights = (jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8))
    return (bits * weights).sum(-1, dtype=jnp.uint8)


def unpack_mask_bits(packed: np.ndarray, width: int) -> np.ndarray:
    """Host-side inverse of ``pack_mask_bits``: (..., W/8) uint8 -> (..., W)
    float32 in {0, 1} (ready for ``finalize_masks_np``)."""
    packed = np.asarray(packed)
    bits = np.unpackbits(packed, axis=-1)[..., :width]
    return bits.astype(np.float32)


def pack_predict_flat(dets, mask_bits: jax.Array) -> jax.Array:
    """Device-side pack of a whole predict output into ONE uint8 buffer.

    (DetResult (B, N, ...), packed mask bits (B, N, H, W/8)) -> (B, L) uint8
    with L = 25*N + N*H*(W/8). One buffer = ONE device->host transfer per
    batch: a DetResult + bits tree is 5 buffers, and even with overlapped
    async copies the per-buffer round-trips dominate tunnel-attached serving
    latency (measured @1024^2 bs2 anchor: 133 -> 125 ms/batch,
    scripts/perf_e2e_depth.py). Inverse: :func:`unpack_predict_flat`
    (same-endianness host assumed, as with any jax transfer).

    Layout per image: [boxes f32 (16N)] [scores f32 (4N)] [labels i32 (4N)]
    [valid u8 (N)] [mask bits (N*H*W/8)].
    """
    import jax.numpy as jnp

    b, n = dets.scores.shape[:2]

    def cast(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(b, -1)

    return jnp.concatenate(
        [
            cast(dets.boxes.astype(jnp.float32)),
            cast(dets.scores.astype(jnp.float32)),
            cast(dets.labels.astype(jnp.int32)),
            dets.valid.astype(jnp.uint8).reshape(b, -1),
            mask_bits.reshape(b, -1),
        ],
        axis=-1,
    )


def unpack_predict_flat(buf: np.ndarray, n: int, mask_hw: Tuple[int, int]):
    """Host-side inverse of :func:`pack_predict_flat`.

    (B, L) uint8 -> dict(boxes (B,N,4) f32, scores (B,N) f32,
    labels (B,N) i32, valid (B,N) bool, mask_bits (B,N,H,W/8) uint8).
    ``mask_hw`` is (H, W/8) — the PACKED byte width.
    """
    buf = np.ascontiguousarray(np.asarray(buf))
    b = buf.shape[0]
    h, wb = mask_hw
    off = 0

    def take(count):
        nonlocal off
        out = buf[:, off : off + count]
        off += count
        return np.ascontiguousarray(out)

    boxes = take(16 * n).view(np.float32).reshape(b, n, 4)
    scores = take(4 * n).view(np.float32).reshape(b, n)
    labels = take(4 * n).view(np.int32).reshape(b, n)
    valid = take(n).astype(bool)
    bits = take(n * h * wb).reshape(b, n, h, wb)
    assert off == buf.shape[1], (off, buf.shape)
    return dict(boxes=boxes, scores=scores, labels=labels, valid=valid,
                mask_bits=bits)


def probs_to_f32(probs: np.ndarray) -> np.ndarray:
    """Host-side dequantization: uint8 (quantize_probs_u8) -> fp32 in [0,1];
    float inputs pass through as fp32."""
    probs = np.asarray(probs)
    if probs.dtype == np.uint8:
        return probs.astype(np.float32) / 255.0
    return probs.astype(np.float32)


def upsample_masks(masks: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear-resize (..., h, w) masks to (..., H, W) on device."""
    out_shape = masks.shape[:-2] + tuple(size)
    return jax.image.resize(masks, out_shape, method="bilinear")


def _np_bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """align_corners=False bilinear resize for (N, H, W) numpy stacks."""
    n, h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1).astype(np.float32)[None, :, None]
    wx = np.clip(xs - x0, 0, 1).astype(np.float32)[None, None, :]
    p00 = img[:, y0[:, None], x0[None, :]]
    p01 = img[:, y0[:, None], x1[None, :]]
    p10 = img[:, y1[:, None], x0[None, :]]
    p11 = img[:, y1[:, None], x1[None, :]]
    return (
        p00 * (1 - wy) * (1 - wx)
        + p01 * (1 - wy) * wx
        + p10 * wy * (1 - wx)
        + p11 * wy * wx
    )


def finalize_masks_np(
    mask_probs: np.ndarray,  # (N, S, S) sigmoid probs (low-res, full-frame)
    batch_input_shape: Tuple[int, int],
    ori_shape: Tuple[int, int],
    scale_factor: Tuple[float, float],  # (w_scale, h_scale)
    thr: float = 0.5,
) -> np.ndarray:
    """Host-side finalization to original resolution binary masks."""
    in_h, in_w = batch_input_shape
    ori_h, ori_w = ori_shape
    w_scale, h_scale = scale_factor
    up = _np_bilinear_resize(probs_to_f32(mask_probs), in_h, in_w)
    crop_h = int(ori_h * h_scale)
    crop_w = int(ori_w * w_scale)
    up = up[:, :crop_h, :crop_w]
    out = _np_bilinear_resize(up, ori_h, ori_w)
    if thr >= 0:
        return out >= thr
    return (out * 255).astype(np.uint8)
