"""OOM-retry guard — the TPU analogue of the reference's ``AvoidOOM``
(``mmdet/utils/memory.py:78``: catch CUDA OOM, retry in fp16, then on CPU).

On TPU the recoverable failure is XLA's RESOURCE_EXHAUSTED at compile or run
time (HBM). The effective mitigations are (a) halving the batch — each half
compiles its own smaller program — and (b) dropping compute to bfloat16.
``oom_guard`` wraps a batched callable with recursive batch-halving;
``convert_batch_bf16`` is the dtype fallback callers can compose in.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def is_oom_error(err: BaseException) -> bool:
    msg = str(err).upper()
    return "RESOURCE_EXHAUSTED" in msg or "OUT OF MEMORY" in msg


def _split_tree(batch, lo: int, hi: int):
    return jax.tree_util.tree_map(lambda x: x[lo:hi], batch)


def _concat_trees(parts):
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)


def oom_guard(fn: Callable, min_batch: int = 1) -> Callable:
    """Wrap ``fn(*leading_args, batch)`` with recursive batch halving on OOM.

    The batch (last positional arg, a pytree with a shared leading batch dim)
    is split in two and the halves run sequentially — peak activation memory
    scales with the shard. Outputs are concatenated back on the leading axis.
    Non-OOM errors propagate unchanged.
    """

    def run(*args):
        *lead, batch = args
        n = jax.tree_util.tree_leaves(batch)[0].shape[0]

        def attempt(batch, n):
            try:
                return fn(*lead, batch)
            except Exception as err:  # jaxlib.XlaRuntimeError and kin
                if not is_oom_error(err) or n <= min_batch:
                    raise
                mid = n // 2
                print(
                    f"oom_guard: RESOURCE_EXHAUSTED at batch {n}; "
                    f"retrying as {mid}+{n - mid}", flush=True,
                )
                left = attempt(_split_tree(batch, 0, mid), mid)
                right = attempt(_split_tree(batch, mid, n), n - mid)
                return _concat_trees([left, right])

        return attempt(batch, n)

    return run


def convert_batch_bf16(batch: Dict[str, Any]) -> Dict[str, Any]:
    """fp32 -> bf16 on floating leaves (the AMP-fallback half of AvoidOOM)."""
    def one(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x

    return {k: one(v) for k, v in batch.items()}
