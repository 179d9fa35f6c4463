"""``_target_`` instantiation (hydra.utils.instantiate equivalent).

Reference usage: train.py:51-64 instantiates datamodule/model/trainer from
config nodes carrying ``_target_`` dotted paths; ``_partial_: true`` yields
a functools.partial (used for optimizers/schedulers,
reference: configs/model/*.yaml).
"""

from __future__ import annotations

import functools
import importlib
from typing import Any


def locate(path: str) -> Any:
    """Import an object from a dotted path."""
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        try:
            obj = importlib.import_module(module_name)
        except ImportError:
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"cannot locate {path!r}")


def instantiate(node: Any, **kwargs: Any) -> Any:
    """Recursively instantiate a config node.

    * dict with ``_target_``: import and call (or partial) with instantiated
      children as kwargs;
    * other dicts/lists: instantiated element-wise;
    * scalars pass through.
    """
    if isinstance(node, list):
        return [instantiate(x) for x in node]
    if not isinstance(node, dict):
        return node
    if "_target_" not in node:
        return {k: instantiate(v) for k, v in node.items()}

    target = locate(node["_target_"])
    partial = bool(node.get("_partial_", False))
    call_args = {
        k: instantiate(v)
        for k, v in node.items()
        if k not in ("_target_", "_partial_", "_args_")
    }
    call_args.update(kwargs)
    pos = [instantiate(a) for a in node.get("_args_", [])]
    if partial:
        return functools.partial(target, *pos, **call_args)
    return target(*pos, **call_args)
