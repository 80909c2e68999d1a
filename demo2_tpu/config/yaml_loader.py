"""YAML / CLI-opts merging compatible with the reference yacs usage.

The reference loads `configs/**/*.yml` via `cfg.merge_from_file` and applies
CLI `opts` via `cfg.merge_from_list` (reference: train_net.py:46-50).  This
module reproduces both against our dataclass config, with light type coercion
(yacs-style): values are cast to the type of the existing default where
possible, lists become tuples, and the literal strings 'None'/'True'/'False'
in opts are parsed as Python values.
"""

from __future__ import annotations

import ast
from typing import Any, List

import yaml

from .defaults import _Node


def _coerce(old: Any, new: Any) -> Any:
    if old is None:
        if isinstance(new, str):
            try:
                return ast.literal_eval(new)
            except (ValueError, SyntaxError):
                return new
        return new
    if isinstance(new, str):
        # yacs allows "None"/"True"/"(1,2)" style strings from CLI opts.
        try:
            lit = ast.literal_eval(new)
            return _coerce(old, lit)
        except (ValueError, SyntaxError):
            pass
    if isinstance(old, bool):
        if isinstance(new, bool):
            return new
        if isinstance(new, (int, float)):
            return bool(new)
        raise TypeError(f"Cannot coerce {new!r} to bool")
    if isinstance(old, tuple) and isinstance(new, (list, tuple)):
        return tuple(new)
    if isinstance(old, int) and isinstance(new, float) and new.is_integer():
        return int(new)
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    return new


def _merge_dict(node: _Node, data: dict, path: str = ""):
    for key, value in data.items():
        if not hasattr(node, key):
            raise KeyError(f"Unknown config key: {path}{key}")
        old = getattr(node, key)
        if isinstance(old, _Node):
            if not isinstance(value, dict):
                raise TypeError(f"Expected mapping for {path}{key}")
            _merge_dict(old, value, path=f"{path}{key}.")
        else:
            setattr(node, key, _coerce(old, value))


def merge_yaml_file(cfg: _Node, path: str):
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    if data:
        _merge_dict(cfg, data)
    return cfg


def merge_opts_list(cfg: _Node, opts: List[Any]):
    """Apply a flat ['A.B', value, 'C.D', value, ...] override list."""
    if not opts:
        return cfg
    if len(opts) % 2 != 0:
        raise ValueError("opts list must have even length (key value pairs)")
    for key, value in zip(opts[0::2], opts[1::2]):
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            node = getattr(node, p)
        old = getattr(node, parts[-1])
        setattr(node, parts[-1], _coerce(old, value))
    return cfg
