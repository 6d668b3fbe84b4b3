"""Checkpointing: orbax save/restore + SAM pretrained-weight loading.

Replaces the reference's mmengine ``CheckpointHook`` (per-epoch save,
``max_keep_ckpts``, ``save_best`` — ``_base_/rsprompter_anchor.py:9``) and the
HF ``pytorch_model.bin`` per-component loading with key rewriting
(``mmdet/rsprompter/models.py:777-783``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 5) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    ckptr.wait_until_finished()
    _prune(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        (int(d.split("_")[1]), d)
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def restore_checkpoint(path: str, target):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.tree_util.tree_map(np.asarray, target))


def _prune(ckpt_dir: str, keep: int) -> None:
    steps = sorted(
        (int(d.split("_")[1]), d)
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    )
    for _, d in steps[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


# ---------------------------------------------------------------------------
# Pretrained SAM -> detector param trees
# ---------------------------------------------------------------------------

# (flax subtree path in detector params) -> torch key prefix in the HF SAM bin
SAM_SUBTREE_PREFIXES: Dict[str, Dict[str, str]] = {
    "RSPrompterAnchor": {
        "backbone": "vision_encoder.",
        "shared_image_embedding": "shared_image_embedding.",
        "roi_head/mask_head/mask_decoder": "mask_decoder.",
        "roi_head/mask_head/no_mask_embed": "prompt_encoder.no_mask_embed.",
    },
    "RSPrompterQuery": {
        "backbone": "vision_encoder.",
        "shared_image_embedding": "shared_image_embedding.",
        "panoptic_head/mask_decoder": "mask_decoder.",
        "panoptic_head/no_mask_embed": "prompt_encoder.no_mask_embed.",
        "panoptic_head/mask_embed_prompt": "prompt_encoder.mask_embed.",
    },
    "SAMSegMaskRCNN": {"backbone": "vision_encoder."},
    "SAMSegMask2Former": {"backbone": "vision_encoder."},
    "SAMDet": {"segmentor": ""},
}


def _get_subtree(params, path: str):
    node = params
    for p in path.split("/"):
        if p not in node:
            return None
        node = node[p]
    return node


def _set_subtree(params, path: str, value):
    node = params
    parts = path.split("/")
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = value


def load_sam_pretrained(
    params: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    model_type: str,
    flatten_linears: Optional[Dict] = None,
    verbose: bool = True,
):
    """Fill SAM-derived subtrees of a detector param tree from a HF SAM
    state_dict. Returns (params, report dict)."""
    from rsprompter_tpu.utils.torch_convert import torch_to_flax

    prefixes = SAM_SUBTREE_PREFIXES[model_type]
    report = {}
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    for path, prefix in prefixes.items():
        sub = _get_subtree(params, path)
        if sub is None:
            continue
        # HF ties prompt_encoder.shared_embedding to shared_image_embedding
        sd = dict(state_dict)
        if "prompt_encoder.shared_embedding.positional_embedding" not in sd and (
            "shared_image_embedding.positional_embedding" in sd
        ):
            sd["prompt_encoder.shared_embedding.positional_embedding"] = sd[
                "shared_image_embedding.positional_embedding"
            ]
        new_sub, missing, used = torch_to_flax(
            sd, sub, prefix=prefix, flatten_linears=flatten_linears
        )
        _set_subtree(params, path, new_sub)
        report[path] = dict(missing=len(missing), used=len(used))
        if verbose and missing:
            print(f"[load_sam_pretrained] {path}: {len(missing)} missing "
                  f"(first: {missing[:3]})")
    return params, report
