"""Optimizer construction: AdamW + warmup-cosine, param freezing via masks.

Behavior parity: the reference training recipe
(``configs/rsprompter/rsprompter_anchor-whu.py:107-133``): AdamW lr 1e-4..2e-4,
wd 0.05, linear warmup 50 iters, cosine to lr*1e-3 over 300 epochs; frozen
subtrees per ``RSPrompterAnchor.__init__``
(``mmdet/rsprompter/models.py:66-75``): backbone iff no PEFT, and with
``decoder_freeze``: shared PE + SAM mask decoder + ``no_mask_embed``.

TPU re-design: torch's ``requires_grad=False`` becomes an optax
``multi_transform`` whose 'frozen' branch is ``set_to_zero`` — parameters stay
in the (replicated or sharded) param tree, their updates are identically zero,
and no optimizer state is materialized for them (ZeRO-friendly).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import optax

FROZEN = "frozen"
TRAIN = "train"

# param-path substrings frozen per model family (reference models.py:66-75,
# 1070-1075, 1228-1231)
DEFAULT_FREEZE_RULES: Dict[str, Tuple[str, ...]] = {
    "backbone_frozen": ("backbone",),
    "decoder_freeze": (
        "shared_image_embedding",
        "mask_decoder",
        "no_mask_embed",
    ),
    "samdet": ("segmentor",),
}


def build_param_label_fn(
    freeze_paths: Sequence[str],
    train_paths_override: Sequence[str] = (),
) -> Callable:
    """Returns params -> pytree of 'frozen'/'train' labels.

    A leaf is frozen when any path component matches a ``freeze_paths`` entry,
    unless a ``train_paths_override`` entry also matches (the LoRA case: the
    backbone is frozen but ``lora_a``/``lora_b`` params inside it train).
    """

    def label(params):
        def walk(node, path):
            if isinstance(node, dict):
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            joined = "/".join(path)
            if any(t in joined for t in train_paths_override):
                return TRAIN
            if any(f in joined for f in freeze_paths):
                return FROZEN
            return TRAIN

        return walk(params, ())

    return label


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 50,
    warmup_start_factor: float = 0.001,
    eta_min_factor: float = 0.001,
) -> optax.Schedule:
    """LinearLR(start_factor) for warmup_steps then cosine to lr*eta_min_factor."""
    warmup = optax.linear_schedule(
        init_value=base_lr * warmup_start_factor,
        end_value=base_lr,
        transition_steps=max(warmup_steps, 1),
    )
    cosine = optax.cosine_decay_schedule(
        init_value=base_lr,
        decay_steps=max(total_steps - warmup_steps, 1),
        alpha=eta_min_factor,
    )
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def build_optimizer(
    params,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    total_steps: int = 10000,
    warmup_steps: int = 50,
    freeze_paths: Sequence[str] = (),
    train_paths_override: Sequence[str] = (),
    grad_clip: Optional[float] = None,
    schedule: Optional[optax.Schedule] = None,
    accumulate_steps: int = 1,
) -> Tuple[optax.GradientTransformation, Any]:
    """Returns (tx, opt_state_labels) with frozen params masked out.

    ``accumulate_steps > 1`` wraps the transform in ``optax.MultiSteps`` —
    gradient accumulation for memory-bound configs (the reference relies on
    small per-GPU batches + DDP instead).
    """
    sched = schedule or warmup_cosine_schedule(base_lr, total_steps, warmup_steps)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(
            learning_rate=sched, b1=0.9, b2=0.999, weight_decay=weight_decay
        )
    )
    train_tx = optax.chain(*chain)
    label_fn = build_param_label_fn(freeze_paths, train_paths_override)
    tx = optax.multi_transform(
        {TRAIN: train_tx, FROZEN: optax.set_to_zero()}, label_fn
    )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx, label_fn(params)
