"""Config-as-python with ``_base_`` inheritance.

Keeps the reference's config surface (mmcv-style python files with the same
key names as configs/occupancy/semantickitti/stereoscene.py) so existing
configs translate unchanged, without depending on mmcv: a config file is
executed in an isolated namespace; ``_base_`` lists parent configs (paths
relative to the child) whose dicts are recursively merged, child keys
winning (ref: tools/train.py:107 Config.fromfile + mmcv merge semantics).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict


def _merge(base: Dict[str, Any], child: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for key, val in child.items():
        if (
            key in out
            and isinstance(out[key], dict)
            and isinstance(val, dict)
            and not val.get("_delete_", False)
        ):
            out[key] = _merge(out[key], val)
        else:
            val = copy.deepcopy(val)
            if isinstance(val, dict):
                val.pop("_delete_", None)
            out[key] = val
    return out


def load_config(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    namespace: Dict[str, Any] = {"__file__": path}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), namespace)

    cfg = {
        k: v
        for k, v in namespace.items()
        if not k.startswith("__") and not callable(v) and not isinstance(v, type(os))
    }

    bases = cfg.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for base in bases:
        base_cfg = load_config(os.path.join(os.path.dirname(path), base))
        merged = _merge(merged, base_cfg)
    return _merge(merged, cfg)


class Config(dict):
    """Attribute-style access over the plain config dict."""

    def __getattr__(self, name):
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return Config(v) if isinstance(v, dict) else v

    @classmethod
    def fromfile(cls, path: str) -> "Config":
        return cls(load_config(path))
