"""Torch checkpoint -> flax params conversion.

A hard requirement of the north star: load the reference's HF SAM checkpoints
(``pytorch_model.bin`` / safetensors) and mmengine ``.pth`` trained weights
into this framework's flax modules. The reference loads per-component with
key rewriting (reference ``mmdet/rsprompter/models.py:777-783`` uses
``revise_keys=[('^module.',''), ('^vision_encoder.','')]``); we mirror that
contract with a ``revise_keys`` regex list.

Mapping strategy: walk the *flax* param tree (so shapes/paths are authoritative),
derive the torch key from the flax path, and transform by leaf kind:

  flax leaf            torch tensor                transform
  ------------------   -------------------------   ---------------------------
  kernel (ndim 2)      Linear.weight (O, I)        transpose -> (I, O)
  kernel (ndim 4)      Conv2d.weight (O,I,kh,kw)   -> (kh, kw, I, O)
  kernel (ndim 4, ConvTranspose2d.weight           spatial flip ->
    name has upscale_conv)          (I,O,kh,kw)    (kh, kw, I, O)
  scale                LayerNorm.weight            as-is
  bias                 .bias                       as-is
  embedding            Embedding.weight            as-is
  (anything else)      buffer/param of same name   as-is

Flax list-module names ``layers_3`` map to torch ``layers.3`` etc.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_LIST_SUFFIX = re.compile(r"^(.*?)((?:_\d+)+)$")


def _expand_indices(name: str) -> str:
    """``downconvs_0_3`` -> ``downconvs.0.3`` (every trailing _N is an index)."""
    m = _LIST_SUFFIX.match(name)
    if not m:
        return name
    base, idxs = m.group(1), m.group(2)
    return base + idxs.replace("_", ".")


def _flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    parts: List[str] = []
    for i, p in enumerate(path):
        is_leaf = i == len(path) - 1
        if is_leaf:
            if p in ("kernel", "scale", "embedding"):
                parts.append("weight")
            elif p in ("mean",):
                parts.append("running_mean")
            elif p in ("var",):
                parts.append("running_var")
            else:
                parts.append(p)
        else:
            if p == "bn":
                continue  # flax _BN wrapper level; torch BN params live on the Sequential idx
            parts.append(_expand_indices(p))
    return ".".join(parts)


# flax path substrings whose 4-D kernels are torch ConvTranspose2d weights
_TRANSPOSE_CONV_HINTS = ("upscale_conv", "deconv", "fpn1_0", "fpn1_3", "fpn2_0")


def _resize_abs_pos_embed(arr: np.ndarray, dst_hw: Tuple[int, int]) -> np.ndarray:
    """Bicubic-resize a (1, H, W, C) abs pos-embed to (1, h, w, C).

    Mirrors the reference's load-time rule for checkpoints whose native input
    size differs from the model's (``mmpretrain/models/backbones/vit_sam.py:
    576-588`` -> ``resize_pos_embed`` in ``mmpretrain/models/utils/embed.py``:
    ``F.interpolate(..., align_corners=False, mode='bicubic')`` on float32).
    Uses torch on host for exact parity with that rule.
    """
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(arr)).float().permute(0, 3, 1, 2)
    t = F.interpolate(t, size=tuple(dst_hw), mode="bicubic", align_corners=False)
    return t.permute(0, 2, 3, 1).numpy()


def _resize_rel_pos(arr: np.ndarray, dst_len: int) -> np.ndarray:
    """Linearly resize a (L1, C) decomposed-rel-pos table to (L2, C).

    Mirrors ``vit_sam.py:636-662`` (``_prepare_relative_position``):
    ``F.interpolate(rel.reshape(1, L1, -1).permute(0, 2, 1), size=L2,
    mode='linear')`` — align_corners=False. Applied when a 1024-native SAM
    checkpoint's global-layer tables load into a model built at another
    input-size bucket (e.g. 512: (127, C) -> (63, C)).
    """
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(arr)).float()
    t = F.interpolate(t.t().unsqueeze(0), size=int(dst_len), mode="linear")
    return t.squeeze(0).t().numpy()


def _transform(
    torch_arr: np.ndarray, flax_leaf_name: str, flax_shape, path,
    flatten_linears: Optional[Dict[str, Tuple[int, int, int]]] = None,
) -> np.ndarray:
    arr = np.asarray(torch_arr)
    if flax_leaf_name == "kernel":
        if arr.ndim == 2:
            # Linears fed by a flattened conv map: torch flattened NCHW
            # (c, h, w) order, flax flattens NHWC (h, w, c) — permute columns.
            for hint, (c, h, w) in (flatten_linears or {}).items():
                if any(hint == p for p in path):
                    o = arr.shape[0]
                    arr = (
                        arr.reshape(o, c, h, w).transpose(0, 2, 3, 1).reshape(o, -1)
                    )
                    break
            arr = arr.T
        elif arr.ndim == 4:
            is_transpose = any(
                hint in p for p in path for hint in _TRANSPOSE_CONV_HINTS
            )
            conv = arr.transpose(2, 3, 1, 0)  # Conv2d (O,I,kh,kw) -> (kh,kw,I,O)
            # ConvTranspose2d (I,O,kh,kw): flip spatial -> (kh,kw,I,O)
            convT = arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            if is_transpose:
                arr = convT
            elif tuple(conv.shape) == tuple(flax_shape):
                arr = conv
            elif tuple(convT.shape) == tuple(flax_shape):
                arr = convT
            else:
                arr = conv
        else:
            raise ValueError(f"Unhandled kernel ndim {arr.ndim} at {path}")
    if tuple(arr.shape) != tuple(flax_shape):
        # Input-size-bucket mismatch: a checkpoint trained at one native size
        # loading into a model built at another. Resize positional tables by
        # the reference's load-time rule (see the two helpers above).
        if (
            flax_leaf_name == "pos_embed"
            and arr.ndim == 4
            and len(flax_shape) == 4
            and arr.shape[0] == flax_shape[0] == 1
            and arr.shape[3] == flax_shape[3]
        ):
            arr = _resize_abs_pos_embed(arr, (flax_shape[1], flax_shape[2]))
        elif (
            flax_leaf_name in ("rel_pos_h", "rel_pos_w")
            and arr.ndim == 2
            and len(flax_shape) == 2
            and arr.shape[1] == flax_shape[1]
        ):
            arr = _resize_rel_pos(arr, flax_shape[0])
    if tuple(arr.shape) != tuple(flax_shape):
        raise ValueError(
            f"Shape mismatch at {'.'.join(path)}: torch {arr.shape} vs flax {tuple(flax_shape)}"
        )
    return np.ascontiguousarray(arr)


def revise_state_dict_keys(
    state_dict: Dict[str, Any], revise_keys: Sequence[Tuple[str, str]]
) -> Dict[str, Any]:
    out = {}
    for k, v in state_dict.items():
        for pat, repl in revise_keys:
            k = re.sub(pat, repl, k)
        out[k] = v
    return out


def torch_to_flax(
    state_dict: Dict[str, Any],
    flax_params: Dict[str, Any],
    prefix: str = "",
    revise_keys: Sequence[Tuple[str, str]] = (),
    strict: bool = False,
    flatten_linears: Optional[Dict[str, Tuple[int, int, int]]] = None,
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Fill a flax param tree from a torch state_dict.

    Returns (params, missing_keys, used_keys). Missing keys keep their flax
    initialization (the reference's HF loader also tolerates missing/extra,
    SURVEY §3.5). ``flatten_linears`` maps flax module names to the (C, H, W)
    of the conv map their input flattens.
    """
    state_dict = revise_state_dict_keys(
        {k: _to_numpy(v) for k, v in state_dict.items()}, revise_keys
    )
    missing: List[str] = []
    used: List[str] = []

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        torch_key = prefix + _flax_path_to_torch_key(path)
        if torch_key in state_dict:
            used.append(torch_key)
            arr = _transform(
                state_dict[torch_key], path[-1], node.shape, path, flatten_linears
            )
            return jnp.asarray(arr, dtype=node.dtype)
        missing.append(torch_key)
        return node

    new_params = walk(flax_params, ())
    if strict and missing:
        raise KeyError(f"Missing torch keys for flax params: {missing[:20]}")
    return new_params, missing, used


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor without importing torch at module scope
    if hasattr(v, "detach"):
        return v.detach().cpu().float().numpy()
    return np.asarray(v)


def flax_to_torch(
    flax_params: Dict[str, Any],
    prefix: str = "",
    flatten_linears: Optional[Dict[str, Tuple[int, int, int]]] = None,
) -> Dict[str, np.ndarray]:
    """Inverse of ``torch_to_flax``: export a flax param tree as a torch-layout
    state_dict (for interop / roundtrip validation)."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        key = prefix + _flax_path_to_torch_key(path)
        arr = np.asarray(node)
        if path[-1] == "kernel":
            if arr.ndim == 2:
                arr = arr.T
                for hint, (c, h, w) in (flatten_linears or {}).items():
                    if any(hint == p for p in path):
                        o = arr.shape[0]
                        arr = (
                            arr.reshape(o, h, w, c).transpose(0, 3, 1, 2).reshape(o, -1)
                        )
                        break
            elif arr.ndim == 4:
                if any(h in p for p in path for h in _TRANSPOSE_CONV_HINTS):
                    arr = arr.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
                else:
                    arr = arr.transpose(3, 2, 0, 1)
        out[key] = np.ascontiguousarray(arr)

    walk(flax_params, ())
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.bin``/``.pth`` (torch pickle) or ``.safetensors`` file into numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}
