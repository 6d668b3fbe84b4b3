"""Device mesh + sharding helpers (the NCCL/DDP/ZeRO replacement, SURVEY §2.5).

The reference distributes with torch DDP (gradient all-reduce) and DeepSpeed
ZeRO-2 (optimizer/grad sharding). TPU-natively both collapse into pjit over a
mesh:

  * DP: batch sharded on the 'data' axis, params replicated — XLA inserts the
    gradient psum over ICI.
  * ZeRO: optimizer-state leaves sharded on 'data' along their largest
    divisible axis (reduce-scatter/all-gather compiled in).
  * TP (beyond-reference, for ViT-H @1024^2 headroom): attention/MLP weights
    sharded on 'model' via path-pattern rules; activations follow by
    propagation.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


# TP rules for the SAM ViT + decoder: column-parallel qkv/lin1, row-parallel
# proj/lin2 (Megatron layout, one psum per block, riding ICI).
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn/qkv/kernel$", P(None, "model")),
    (r".*attn/qkv/bias$", P("model")),
    (r".*attn/proj/kernel$", P("model", None)),
    (r".*mlp/lin1/kernel$", P(None, "model")),
    (r".*mlp/lin1/bias$", P("model")),
    (r".*mlp/lin2/kernel$", P("model", None)),
)


def param_shardings(
    params, mesh: Mesh, tp_rules: Sequence[Tuple[str, P]] = ()
) -> Any:
    """Pytree of NamedShardings: TP rules where they match, replicated otherwise."""
    compiled = [(re.compile(pat), spec) for pat, spec in tp_rules]

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        joined = "/".join(path)
        for pat, spec in compiled:
            if pat.match(joined):
                # only apply when divisible; else replicate
                axis_ok = True
                for dim, axis in zip(node.shape, spec):
                    if axis is not None and dim % mesh.shape[axis] != 0:
                        axis_ok = False
                if axis_ok and len(spec) <= node.ndim:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return walk(params, ())


def batch_shardings(batch, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every batch leaf along its leading (batch) dimension."""

    def one(leaf):
        return NamedSharding(mesh, P(axis))

    return jax.tree_util.tree_map(one, batch)


def zero_shardings(opt_state, params_shardings, mesh: Mesh, axis: str = "data"):
    """ZeRO-style optimizer-state sharding: moment tensors sharded on ``axis``
    along their largest divisible dimension; scalars/steps replicated."""
    n = mesh.shape[axis]

    def one(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        # shard the largest divisible axis
        dims = [(d, i) for i, d in enumerate(leaf.shape) if d % n == 0 and d >= n]
        if not dims:
            return NamedSharding(mesh, P())
        _, idx = max(dims)
        spec = [None] * leaf.ndim
        spec[idx] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(one, opt_state)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def mesh_from_config(dist_cfg: Optional[dict] = None):
    """CLI entry for distributed execution (the dist_train.sh replacement).

    Builds a (data, model) mesh over every visible device. Config vocabulary
    (under the ``dist`` key): ``model_parallel`` (TP degree, default 1),
    ``zero`` (shard optimizer state on 'data', default True), ``enable``
    (force on/off; default: on iff more than one device).

    Returns (mesh | None, tp_rules, zero).
    """
    dist_cfg = dict(dist_cfg or {})
    n_devices = jax.device_count()
    enable = dist_cfg.get("enable", n_devices > 1)
    if not enable or n_devices == 1:
        return None, (), bool(dist_cfg.get("zero", True))
    n_model = int(dist_cfg.get("model_parallel", 1))
    assert n_devices % n_model == 0, (n_devices, n_model)
    mesh = make_mesh(n_data=n_devices // n_model, n_model=n_model)
    tp_rules = DEFAULT_TP_RULES if n_model > 1 else ()
    return mesh, tp_rules, bool(dist_cfg.get("zero", True))
