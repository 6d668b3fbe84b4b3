"""Model builder: reference-flavored config dict -> flax detector.

Keeps the reference's key vocabulary (``type='RSPrompterAnchor'``,
``prompt_shape``, ``hf_sam_pretrain_name``, ``decoder_freeze``, ``num_classes``,
``train_cfg``/``test_cfg`` — see ``configs/rsprompter/_base_/rsprompter_anchor.py``)
while constructing this framework's modules. Also derives the optimizer
freeze-path list from the model type + flags (the reference's
``frozen_modules`` logic, ``mmdet/rsprompter/models.py:66-75``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from rsprompter_tpu.core.registry import MODELS
from rsprompter_tpu.models.detectors.rsprompter_anchor import RSPrompterAnchor
from rsprompter_tpu.models.detectors.samdet import SAMDet
from rsprompter_tpu.models.detectors.two_stage import SAMSegMaskRCNN

MODELS.register_module(name="RSPrompterAnchor", module=RSPrompterAnchor)
MODELS.register_module(name="SAMSegMaskRCNN", module=SAMSegMaskRCNN)
MODELS.register_module(name="SAMDet", module=SAMDet)


def _arch_from_cfg(cfg: Dict[str, Any]) -> str:
    name = cfg.get("hf_sam_pretrain_name") or cfg.get("arch", "base")
    for key in ("base", "large", "huge"):
        if key in name:
            return key
    return name


_ARCH_SELECT_LAYERS = {
    "base": tuple(range(1, 13, 2)),
    "large": tuple(range(1, 25, 2)),
    "huge": tuple(range(1, 33, 2)),
}


def build_detector(model_cfg: Dict[str, Any]):
    """Build a detector module from a config dict (reference vocabulary)."""
    cfg = dict(model_cfg)
    mtype = cfg.pop("type")
    arch = _arch_from_cfg(cfg)
    peft = cfg.get("peft_config")
    common = dict(
        arch=arch,
        image_size=cfg.get("image_size", 1024),
        num_classes=cfg.get("num_classes", 1),
        train_cfg=cfg.get("train_cfg"),
        test_cfg=cfg.get("test_cfg"),
        dtype=jnp.bfloat16 if cfg.get("bf16", False) else None,
        # fused Pallas attention (packed qkv + fused MLP) by default on TPU;
        # XLA reference path on CPU. Non-64 head_dims fall back internally.
        attn_impl=cfg.get(
            "attn_impl", "fused" if jax.default_backend() == "tpu" else "xla"
        ),
    )
    lora = dict(
        lora_rank=(peft or {}).get("r", 0),
        lora_alpha=(peft or {}).get("lora_alpha", 32.0),
    )
    # Tiny-model escape hatch (regression/smoke configs, CPU CI): a raw
    # vision_config dict overrides the named arch, and the stride ladders
    # follow for small image sizes. Not part of the reference vocabulary.
    if cfg.get("vision_config") is not None and mtype != "SAMDet":
        from rsprompter_tpu.models.sam.configs import SamVisionConfig

        common["vision_config"] = SamVisionConfig(**cfg["vision_config"])
    for key in ("rpn_strides", "roi_strides"):
        if cfg.get(key) is not None and mtype in (
            "RSPrompterAnchor", "SAMSegMaskRCNN", "SAMDet"
        ):
            common[key] = tuple(cfg[key])
    # Exact (max-subtracted) softmax in the fused attention whenever the
    # encoder receives gradients: from-scratch/LoRA training can push logits
    # outside the clamp's (-60, 60) exact range (ADVICE r2). Frozen encoders
    # keep the faster clamp.
    backbone_trains = peft is not None or cfg.get("train_backbone", False)
    safe_sm = dict(safe_softmax=cfg.get("safe_softmax", backbone_trains))
    if mtype == "RSPrompterAnchor":
        return RSPrompterAnchor(
            **common, **lora, **safe_sm,
            prompt_shape=tuple(cfg.get("prompt_shape", (100, 5))),
            select_layers=tuple(
                cfg.get("select_layers", _ARCH_SELECT_LAYERS[arch])
            ),
            aggregator_hidden=cfg.get("aggregator_hidden", 32),
            aggregator_type=cfg.get("aggregator_type", "multi"),
            with_sincos=cfg.get("with_sincos", True),
            multimask_output=cfg.get("multimask_output", False),
            decoder_freeze=cfg.get("decoder_freeze", True),
            freeze_backbone=cfg.get("peft_config") is None
            and not cfg.get("train_backbone", False),
            num_samples=cfg.get("num_samples", 256),
            pos_fraction=cfg.get("pos_fraction", 0.25),
            mask_loss_resolution=cfg.get("mask_loss_resolution", "full"),
        )
    if mtype == "SAMSegMaskRCNN":
        return SAMSegMaskRCNN(
            **common, **lora, **safe_sm,
            select_layers=tuple(
                cfg.get("select_layers", _ARCH_SELECT_LAYERS[arch])
            ),
            aggregator_hidden=cfg.get("aggregator_hidden", 32),
            aggregator_type=cfg.get("aggregator_type", "multi"),
            freeze_backbone=cfg.get("peft_config") is None
            and not cfg.get("train_backbone", False),
            num_samples=cfg.get("num_samples", 512),
            pos_fraction=cfg.get("pos_fraction", 0.25),
        )
    if mtype == "SAMDet":
        return SAMDet(
            **common,
            resnet_depth=cfg.get("resnet_depth", 50),
            num_samples=cfg.get("num_samples", 512),
            pos_fraction=cfg.get("pos_fraction", 0.25),
        )
    if mtype == "SAMSegMask2Former":
        from rsprompter_tpu.models.detectors.rsprompter_query import SAMSegMask2Former

        return SAMSegMask2Former(
            **common, **lora, **safe_sm,
            prompt_shape=tuple(cfg.get("prompt_shape", (100, 5))),
            select_layers=tuple(
                cfg.get("select_layers", _ARCH_SELECT_LAYERS[arch])
            ),
            aggregator_hidden=cfg.get("aggregator_hidden", 32),
            aggregator_type=cfg.get("aggregator_type", "multi"),
            freeze_backbone=cfg.get("peft_config") is None
            and not cfg.get("train_backbone", False),
        )
    if mtype == "RSPrompterQuery":
        from rsprompter_tpu.models.detectors.rsprompter_query import RSPrompterQuery

        return RSPrompterQuery(
            **common, **lora, **safe_sm,
            prompt_shape=tuple(cfg.get("prompt_shape", (100, 5))),
            select_layers=tuple(
                cfg.get("select_layers", _ARCH_SELECT_LAYERS[arch])
            ),
            aggregator_hidden=cfg.get("aggregator_hidden", 32),
            aggregator_type=cfg.get("aggregator_type", "multi"),
            with_sincos=cfg.get("with_sincos", True),
            decoder_freeze=cfg.get("decoder_freeze", True),
            freeze_backbone=cfg.get("peft_config") is None
            and not cfg.get("train_backbone", False),
        )
    raise KeyError(f"Unknown detector type '{mtype}'")


def freeze_paths_for(model_cfg: Dict[str, Any]) -> Tuple[List[str], List[str]]:
    """(freeze_paths, train_overrides) per the reference freeze rules."""
    mtype = model_cfg["type"]
    freeze: List[str] = []
    override: List[str] = []
    peft = model_cfg.get("peft_config")
    if model_cfg.get("train_backbone", False):
        # from-scratch / full-finetune mode (no pretrained SAM available):
        # beyond the reference's surface, which always freezes the encoder
        # unless peft is set (models.py:66-75)
        pass
    elif peft is None:
        freeze.append("backbone")
    else:
        freeze.append("backbone")
        override += ["lora_a", "lora_b"]
    if mtype in ("RSPrompterAnchor", "RSPrompterQuery") and model_cfg.get(
        "decoder_freeze", True
    ):
        freeze += ["shared_image_embedding", "mask_decoder", "no_mask_embed"]
    if mtype == "SAMDet":
        freeze = ["segmentor"]
    return freeze, override
