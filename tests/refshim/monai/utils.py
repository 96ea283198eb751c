"""monai.utils shim: ensure_tuple_rep + optional_import (MONAI 1.0.1
semantics, monai/utils/misc.py + monai/utils/module.py)."""
from __future__ import annotations

import importlib


def ensure_tuple_rep(val, dim: int):
    if isinstance(val, (int, float, str)) or val is None:
        return (val,) * dim
    try:
        t = tuple(val)
    except TypeError:
        return (val,) * dim
    if len(t) == dim:
        return t
    raise ValueError(f"Sequence must have length {dim}, got {len(t)}.")


class _LazyRaise:
    def __init__(self, msg):
        self._msg = msg

    def __getattr__(self, name):
        raise ImportError(self._msg)

    def __call__(self, *a, **k):
        raise ImportError(self._msg)


def optional_import(module: str, version: str = "", version_checker=None,
                    name: str = "", descriptor: str = "", version_args=None,
                    allow_namespace_pkg: bool = False):
    try:
        mod = importlib.import_module(module)
        if name:
            mod = getattr(mod, name)
        return mod, True
    except Exception as e:  # pragma: no cover - matches monai's behavior
        return _LazyRaise(f"optional import of {module} failed: {e}"), False
