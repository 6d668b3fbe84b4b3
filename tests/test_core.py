"""Tests for the core substrate: config, registry, structures."""

import os
import textwrap

import jax
import numpy as np
import pytest

from rsprompter_tpu.core.config import Config, merge_dict
from rsprompter_tpu.core.registry import Registry
from rsprompter_tpu.core.structures import DetDataSample, InstanceData


def test_registry_build():
    reg = Registry("test")

    @reg.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = reg.build(dict(type="Foo", a=1))
    assert obj.a == 1 and obj.b == 2
    # passthrough of built objects
    assert reg.build(obj) is obj
    with pytest.raises(KeyError):
        reg.build(dict(type="Missing"))


def test_config_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text(
        textwrap.dedent(
            """
            model = dict(type='A', backbone=dict(type='B', depth=50), head=dict(type='H'))
            lr = 0.1
            """
        )
    )
    child = tmp_path / "child.py"
    child.write_text(
        textwrap.dedent(
            """
            _base_ = ['./base.py']
            model = dict(backbone=dict(depth=18), neck=dict(_delete_=True, type='N'))
            lr = 0.2
            """
        )
    )
    cfg = Config.fromfile(str(child))
    assert cfg.model.type == "A"
    assert cfg.model.backbone.depth == 18
    assert cfg.model.backbone.type == "B"
    assert cfg.model.neck.type == "N"
    assert cfg.lr == 0.2


def test_config_delete_replaces_subtree():
    base = {"m": {"a": 1, "b": 2}}
    child = {"m": {"_delete_": True, "c": 3}}
    out = merge_dict(base, child)
    assert out["m"] == {"c": 3}


def test_config_dotted_override(tmp_path):
    f = tmp_path / "c.py"
    f.write_text("model = dict(depth=50)\n")
    cfg = Config.fromfile(str(f))
    cfg.merge_from_options(["model.depth=18", "model.name=foo", "new.key=1.5"])
    assert cfg.model.depth == 18
    assert cfg.model.name == "foo"
    assert cfg.new.key == 1.5


def test_instance_data_pytree():
    ins = InstanceData(
        bboxes=np.zeros((3, 4), np.float32),
        labels=np.array([0, 1, 2]),
        metainfo={"img_id": 7},
    )
    assert len(ins) == 3
    leaves = jax.tree_util.tree_leaves(ins)
    assert len(leaves) == 2
    # roundtrip through tree_map
    out = jax.tree_util.tree_map(lambda x: x, ins)
    assert out.metainfo["img_id"] == 7
    assert out.bboxes.shape == (3, 4)
    # slicing
    sub = ins[:2]
    assert len(sub) == 2


def test_det_data_sample():
    s = DetDataSample(metainfo={"img_shape": (64, 64), "ori_shape": (60, 60)})
    s.gt_instances = InstanceData(bboxes=np.zeros((2, 4), np.float32))
    assert s.img_shape == (64, 64)
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 1
    out = jax.tree_util.tree_map(lambda x: x * 2, s)
    assert out.metainfo["ori_shape"] == (60, 60)


def test_eight_cpu_devices():
    assert jax.device_count() >= 8
