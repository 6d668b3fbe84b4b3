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


def restore_train_params(path: str):
    """Structure-free restore of a Runner train-state checkpoint.

    Returns (params, batch_stats_or_None). Eval/demo tools have no
    optimizer, so a params-only target would trip orbax's structure match
    against the saved {params, batch_stats, opt_state, step} tree; restore
    the whole tree and keep what inference needs.
    """
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return restored["params"], restored.get("batch_stats") or None


def restore_checkpoint(path: str, target):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # orbax requires absolute paths (save_checkpoint absolutizes; resume
    # paths from a relative --work-dir must match)
    return ckptr.restore(
        os.path.abspath(path), target=jax.tree_util.tree_map(np.asarray, target)
    )


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


# reference-trained mmengine .pth -> this framework's param-tree naming.
# The reference wraps HF modules one level deep (RSSamVisionEncoder holds
# `vision_encoder`, RSSamMaskDecoder holds `mask_decoder`, ... — reference
# mmdet/rsprompter/models.py:719-914), and mmdet's MultiheadAttention packs
# qkv as torch `attn.in_proj_*`.
REFERENCE_PTH_REVISE_KEYS = [
    (r"^module\.", ""),
    (r"^backbone\.vision_encoder\.", "backbone."),
    (r"^shared_image_embedding\.shared_image_embedding\.", "shared_image_embedding."),
    (r"^neck\.feature_aggregator\.", "neck_feature_aggregator."),
    (r"^neck\.feature_spliter\.", "neck_feature_spliter."),
    (r"\.mask_decoder\.mask_decoder\.", ".mask_decoder."),
    (r"^panoptic_head\.pixel_decoder\.encoder\.layers\.", "panoptic_head.pixel_decoder.encoder_layers."),
    (r"^panoptic_head\.transformer_decoder\.layers\.", "panoptic_head.transformer_decoder_layers."),
    (r"^panoptic_head\.transformer_decoder\.post_norm\.", "panoptic_head.transformer_decoder_post_norm."),
    (r"^panoptic_head\.level_embed\.", "panoptic_head.level_embed."),
    (r"\.input_convs\.(\d+)\.gn\.", r".input_convs.\1.gn."),
]

# conv->linear flatten boundaries present in the reference heads
REFERENCE_FLATTEN_LINEARS = {
    "shared_fcs_0": (256, 7, 7),
    "point_emb_4": (256, 7, 7),
}


def _split_packed_mha(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch nn.MultiheadAttention packed qkv -> separate q/k/v projections."""
    out = {}
    for k, v in sd.items():
        if k.endswith(".attn.in_proj_weight"):
            base = k[: -len(".attn.in_proj_weight")]
            c = v.shape[0] // 3
            out[f"{base}.q_proj.weight"] = v[:c]
            out[f"{base}.k_proj.weight"] = v[c : 2 * c]
            out[f"{base}.v_proj.weight"] = v[2 * c :]
        elif k.endswith(".attn.in_proj_bias"):
            base = k[: -len(".attn.in_proj_bias")]
            c = v.shape[0] // 3
            out[f"{base}.q_proj.bias"] = v[:c]
            out[f"{base}.k_proj.bias"] = v[c : 2 * c]
            out[f"{base}.v_proj.bias"] = v[2 * c :]
        elif ".attn.out_proj." in k:
            out[k.replace(".attn.out_proj.", ".out_proj.")] = v
        else:
            out[k] = v
    return out


def load_reference_checkpoint(
    params: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    verbose: bool = True,
):
    """Load a reference-trained mmengine ``.pth`` state_dict into a detector
    param tree (the paper-weights path of the north star). Returns
    (params, missing_keys)."""
    from rsprompter_tpu.utils.torch_convert import (
        revise_state_dict_keys,
        torch_to_flax,
    )

    sd = _split_packed_mha(
        revise_state_dict_keys(state_dict, REFERENCE_PTH_REVISE_KEYS)
    )
    new_params, missing, used = torch_to_flax(
        sd, params, flatten_linears=REFERENCE_FLATTEN_LINEARS
    )
    if verbose:
        print(
            f"[load_reference_checkpoint] used {len(used)} tensors, "
            f"{len(missing)} params missing"
        )
        if missing:
            print("  first missing:", missing[:5])
    return new_params, missing


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
