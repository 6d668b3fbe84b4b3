"""Typed data containers (pytrees) replacing the reference's structures layer.

``InstanceData``/``DetDataSample`` mirror the roles of mmengine's
``InstanceData`` and the reference's ``DetDataSample``
(reference ``mmdet/structures/det_data_sample.py:7``), re-designed as JAX
pytrees: array fields are leaves; ``metainfo`` is static auxiliary data so a
jitted function does not retrace on image-path changes etc.

On-device code in this framework uses **fixed-size padded tensors with
validity masks**; these containers are the host-facing view (API outputs,
test fixtures, dataset samples).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import jax
import numpy as np


class InstanceData:
    """Per-instance fields (bboxes [N,4], labels [N], scores [N], masks [N,H,W]).

    All fields must share the leading dimension N. Behaves like a simple
    attribute bag with len/slicing, and is a registered pytree.
    """

    def __init__(self, metainfo: Optional[Dict[str, Any]] = None, **fields):
        object.__setattr__(self, "_fields", {})
        object.__setattr__(self, "metainfo", dict(metainfo or {}))
        for k, v in fields.items():
            setattr(self, k, v)

    # -- attribute protocol -------------------------------------------------
    def __setattr__(self, name, value):
        if name in ("metainfo", "_fields"):
            object.__setattr__(self, name, value)
        else:
            self._fields[name] = value

    def __getattr__(self, name):
        fields = object.__getattribute__(self, "_fields")
        if name in fields:
            return fields[name]
        raise AttributeError(name)

    def __contains__(self, name):
        return name in self._fields

    def get(self, name, default=None):
        return self._fields.get(name, default)

    def keys(self):
        return self._fields.keys()

    def items(self):
        return self._fields.items()

    def __len__(self):
        for v in self._fields.values():
            if hasattr(v, "shape") and len(v.shape) >= 1:
                return int(v.shape[0])
            if isinstance(v, (list, tuple)):
                return len(v)
        return 0

    def __getitem__(self, idx):
        new = InstanceData(metainfo=self.metainfo)
        for k, v in self._fields.items():
            new._fields[k] = v[idx]
        return new

    @staticmethod
    def cat(instances):
        """Concatenate along the instance axis."""
        if not instances:
            return InstanceData()
        keys = instances[0]._fields.keys()
        new = InstanceData(metainfo=instances[0].metainfo)
        for k in keys:
            vals = [ins._fields[k] for ins in instances]
            new._fields[k] = np.concatenate([np.asarray(v) for v in vals], axis=0)
        return new

    def numpy(self) -> "InstanceData":
        new = InstanceData(metainfo=self.metainfo)
        for k, v in self._fields.items():
            new._fields[k] = np.asarray(v)
        return new

    def __repr__(self):
        lines = [f"InstanceData(n={len(self)})"]
        for k, v in self._fields.items():
            shape = getattr(v, "shape", None)
            lines.append(f"  {k}: {shape if shape is not None else type(v).__name__}")
        return "\n".join(lines)


def _instance_flatten(x: InstanceData):
    keys = sorted(x._fields.keys())
    children = tuple(x._fields[k] for k in keys)
    aux = (tuple(keys), tuple(sorted(x.metainfo.items(), key=lambda kv: kv[0])))
    return children, aux


def _instance_unflatten(aux, children):
    keys, meta = aux
    new = InstanceData(metainfo=dict(meta))
    for k, v in zip(keys, children):
        new._fields[k] = v
    return new


jax.tree_util.register_pytree_node(InstanceData, _instance_flatten, _instance_unflatten)


class DetDataSample:
    """One image's sample: gt/pred instances + static metainfo.

    metainfo keys used across the framework (mirroring the reference):
    ``img_shape`` (post-resize, pre-pad HxW), ``ori_shape`` (original HxW),
    ``scale_factor`` (w_scale, h_scale), ``batch_input_shape`` (padded HxW),
    ``pad_shape``, ``img_path``, ``img_id``, ``flip``.
    """

    SLOTS = ("gt_instances", "pred_instances", "ignored_instances", "proposals")

    def __init__(self, metainfo: Optional[Dict[str, Any]] = None, **kwargs):
        object.__setattr__(self, "metainfo", dict(metainfo or {}))
        for slot in self.SLOTS:
            object.__setattr__(self, slot, kwargs.pop(slot, None))
        if kwargs:
            raise TypeError(f"Unknown DetDataSample fields: {sorted(kwargs)}")

    def set_metainfo(self, meta: Dict[str, Any]):
        self.metainfo.update(meta)
        return self

    def __getattr__(self, name):
        # metainfo passthrough for convenience (sample.img_shape)
        meta = object.__getattribute__(self, "metainfo")
        if name in meta:
            return meta[name]
        raise AttributeError(name)

    def clone(self) -> "DetDataSample":
        new = DetDataSample(metainfo=copy.deepcopy(self.metainfo))
        for slot in self.SLOTS:
            v = getattr(self, slot)
            object.__setattr__(new, slot, v)
        return new

    def __repr__(self):
        parts = [f"DetDataSample(meta={sorted(self.metainfo)})"]
        for slot in self.SLOTS:
            v = getattr(self, slot)
            if v is not None:
                parts.append(f"  {slot}: n={len(v)}")
        return "\n".join(parts)


def _sample_flatten(x: DetDataSample):
    children = tuple(getattr(x, s) for s in DetDataSample.SLOTS)
    aux = tuple(sorted(x.metainfo.items(), key=lambda kv: kv[0]))
    return children, aux


def _sample_unflatten(aux, children):
    new = DetDataSample(metainfo=dict(aux))
    for slot, v in zip(DetDataSample.SLOTS, children):
        object.__setattr__(new, slot, v)
    return new


jax.tree_util.register_pytree_node(DetDataSample, _sample_flatten, _sample_unflatten)
