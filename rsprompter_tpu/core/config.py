"""Config system: Python-file configs with ``_base_`` inheritance.

Config-compatible with the reference's key vocabulary (reference
``configs/rsprompter/_base_/rsprompter_anchor.py``): a config is a Python file
whose module-level variables form a dict; ``_base_ = ['./a.py', ...]`` merges
parent configs; a child dict containing ``_delete_: True`` replaces (rather
than merges into) the base subtree; dotted CLI overrides
(``--cfg-options a.b.c=v``) update nested keys.
"""

from __future__ import annotations

import ast
import copy
import os
import types
from typing import Any, Dict, List, Optional, Union

_RESERVED = ("_base_",)


def _is_dict(x) -> bool:
    return isinstance(x, dict)


def merge_dict(base: Dict, child: Dict) -> Dict:
    """Recursively merge ``child`` on top of ``base`` (mmengine semantics)."""
    out = copy.deepcopy(base)
    for k, v in child.items():
        if _is_dict(v) and v.pop("_delete_", False):
            out[k] = copy.deepcopy(v)
        elif k in out and _is_dict(out[k]) and _is_dict(v):
            out[k] = merge_dict(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _exec_config_file(filename: str) -> Dict[str, Any]:
    filename = os.path.abspath(os.path.expanduser(filename))
    with open(filename, "r") as f:
        code = f.read()
    # validate syntax early for a clear error message
    ast.parse(code, filename=filename)
    module = types.ModuleType("_cfg_")
    module.__file__ = filename
    exec(compile(code, filename, "exec"), module.__dict__)
    cfg = {
        k: v
        for k, v in module.__dict__.items()
        if not k.startswith("__") and not isinstance(v, types.ModuleType)
        and not callable(v) or k in _RESERVED
    }
    return cfg


def set_by_dotted(d: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    cur = d
    for k in keys[:-1]:
        nxt = cur.get(k) if isinstance(cur, dict) else None
        if not isinstance(nxt, dict):
            nxt = {}
            cur[k] = nxt
        cur = nxt
    cur[keys[-1]] = value


def _parse_value(v: str) -> Any:
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v


class Config(dict):
    """A dict with attribute access and ``fromfile`` loading."""

    def __getattr__(self, name):
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(v, dict) and not isinstance(v, Config):
            v = Config(v)
            self[name] = v
        return v

    def __setattr__(self, name, value):
        self[name] = value

    @staticmethod
    def fromfile(filename: Union[str, os.PathLike]) -> "Config":
        filename = str(filename)
        raw = _exec_config_file(filename)
        bases = raw.pop("_base_", [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        cfg_dir = os.path.dirname(os.path.abspath(filename))
        for b in bases:
            base_cfg = Config.fromfile(os.path.join(cfg_dir, b))
            merged = merge_dict(merged, dict(base_cfg))
        merged = merge_dict(merged, raw)
        cfg = Config(merged)
        cfg.__dict__["_filename"] = filename
        return cfg

    @staticmethod
    def fromdict(d: Dict[str, Any]) -> "Config":
        return Config(copy.deepcopy(d))

    def merge_from_options(self, options: Optional[Union[Dict[str, Any], List[str]]]) -> None:
        """Apply dotted overrides: dict {'a.b': v} or list ['a.b=v', ...]."""
        if not options:
            return
        if isinstance(options, (list, tuple)):
            parsed = {}
            for item in options:
                k, _, v = item.partition("=")
                parsed[k] = _parse_value(v)
            options = parsed
        for k, v in options.items():
            set_by_dotted(self, k, v)

    def dump(self, path: str) -> None:
        import pprint

        with open(path, "w") as f:
            for k, v in self.items():
                f.write(f"{k} = {pprint.pformat(v, width=100)}\n")
