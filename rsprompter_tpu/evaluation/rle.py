"""RLE mask encoding + IoU: ctypes bindings to the native C++ library.

pycocotools-compatible semantics (column-major runs, leading 0-run; crowd GTs
scored as IoF) — see ``native/rle.cpp``. Falls back to a pure-numpy
implementation when the shared library is unavailable; the native path is
~100x faster and is what eval uses in practice.

The library auto-builds on first import if a compiler is present
(``make -C native``), mirroring how the reference relies on pycocotools'
compiled extension.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librle.so")
_lib: Optional[ctypes.CDLL] = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "rle.cpp")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    )
    if not os.path.exists(_LIB_PATH) or stale:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"] + (["-B"] if stale else []),
                check=True, capture_output=True,
            )
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.rle_encode_batch.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u32p, i64p
    ]
    lib.rle_iou_matrix.argtypes = [
        u32p, i64p, ctypes.c_int, u32p, i64p, ctypes.c_int, u8p, f64p
    ]
    lib.rle_decode.argtypes = [u32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [u32p, ctypes.c_int]
    if hasattr(lib, "match_image"):  # absent only in a stale prebuilt .so
        lib.match_image.argtypes = [
            f64p, ctypes.c_int, ctypes.c_int, u8p, u8p, f64p, ctypes.c_int,
            i64p, u8p,
        ]
    _lib = lib
    return lib


class RLE:
    """One encoded mask: (h, w, counts uint32 array)."""

    __slots__ = ("h", "w", "counts")

    def __init__(self, h: int, w: int, counts: np.ndarray):
        self.h, self.w = h, w
        self.counts = np.ascontiguousarray(counts, np.uint32)

    def area(self) -> int:
        return int(self.counts[1::2].sum())

    def to_coco(self) -> dict:
        """pycocotools-style dict (uncompressed counts list)."""
        return {"size": [self.h, self.w], "counts": self.counts.tolist()}

    @staticmethod
    def from_coco(d: dict) -> "RLE":
        h, w = d["size"]
        counts = d["counts"]
        if isinstance(counts, (bytes, str)):
            raise ValueError("compressed RLE strings not supported; use lists")
        return RLE(h, w, np.asarray(counts, np.uint32))


def encode_masks(masks: np.ndarray) -> List[RLE]:
    """(N, H, W) bool/uint8 -> list of RLE."""
    masks = np.ascontiguousarray(masks.astype(np.uint8))
    n, h, w = masks.shape
    if n == 0:
        return []
    lib = _load_lib()
    if lib is not None:
        counts = np.empty(n * (h * w + 1), np.uint32)
        offsets = np.empty(n + 1, np.int64)
        lib.rle_encode_batch(
            masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return [
            RLE(h, w, counts[offsets[i] : offsets[i + 1]].copy()) for i in range(n)
        ]
    # numpy fallback: column-major flatten + run-length
    out = []
    for i in range(n):
        flat = masks[i].T.reshape(-1)
        changes = np.flatnonzero(np.diff(flat)) + 1
        bounds = np.concatenate([[0], changes, [flat.size]])
        runs = np.diff(bounds).astype(np.uint32)
        if flat[0] == 1:
            runs = np.concatenate([[np.uint32(0)], runs])
        out.append(RLE(h, w, runs))
    return out


def decode_mask(rle: RLE) -> np.ndarray:
    lib = _load_lib()
    out = np.zeros((rle.h, rle.w), np.uint8)
    if lib is not None:
        lib.rle_decode(
            rle.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(rle.counts), rle.h, rle.w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    flat = np.zeros(rle.h * rle.w, np.uint8)
    pos = 0
    v = 0
    for c in rle.counts:
        if v:
            flat[pos : pos + c] = 1
        pos += int(c)
        v = 1 - v
    return flat.reshape(rle.w, rle.h).T


def _pack(rles: Sequence[RLE]) -> Tuple[np.ndarray, np.ndarray]:
    counts = (
        np.concatenate([r.counts for r in rles])
        if rles
        else np.zeros(0, np.uint32)
    )
    offsets = np.zeros(len(rles) + 1, np.int64)
    for i, r in enumerate(rles):
        offsets[i + 1] = offsets[i] + len(r.counts)
    return np.ascontiguousarray(counts), offsets


def iou_matrix(
    dets: Sequence[RLE], gts: Sequence[RLE], iscrowd: Optional[Sequence[bool]] = None
) -> np.ndarray:
    """(D, G) IoU (crowd GTs -> intersection-over-det-area)."""
    d, g = len(dets), len(gts)
    if d == 0 or g == 0:
        return np.zeros((d, g))
    crowd = np.asarray(
        iscrowd if iscrowd is not None else np.zeros(g, bool), np.uint8
    )
    lib = _load_lib()
    if lib is not None:
        dc, do = _pack(dets)
        gc, go = _pack(gts)
        out = np.zeros((d, g), np.float64)
        lib.rle_iou_matrix(
            dc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            do.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), d,
            gc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            go.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), g,
            crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out
    dm = np.stack([decode_mask(r).reshape(-1) for r in dets]).astype(np.float64)
    gm = np.stack([decode_mask(r).reshape(-1) for r in gts]).astype(np.float64)
    inter = dm @ gm.T
    da = dm.sum(1)[:, None]
    ga = gm.sum(1)[None, :]
    union = np.where(crowd[None, :].astype(bool), da, da + ga - inter)
    return np.where(union > 0, inter / union, 0.0)
