"""Config pretty-printing and tag enforcement.

Reference: chimeralm/utils/rich_utils.py (rich config tree, enforce_tags).
Uses ``rich`` when available; falls back to plain YAML.
"""

from __future__ import annotations

import logging
from pathlib import Path

import yaml

log = logging.getLogger(__name__)

PRINT_ORDER = ("data", "model", "callbacks", "logger", "trainer", "paths", "extras")


def print_config_tree(cfg: dict, save_to_file: str | Path | None = None) -> None:
    ordered = [k for k in PRINT_ORDER if k in cfg] + [k for k in cfg if k not in PRINT_ORDER]
    try:
        import rich
        import rich.tree

        tree = rich.tree.Tree("CONFIG")
        for key in ordered:
            branch = tree.add(key)
            branch.add(yaml.safe_dump(cfg[key], sort_keys=False) if isinstance(cfg[key], dict) else str(cfg[key]))
        rich.print(tree)
    except ImportError:
        print(yaml.safe_dump({k: cfg[k] for k in ordered}, sort_keys=False))
    if save_to_file:
        Path(save_to_file).write_text(yaml.safe_dump(cfg, sort_keys=False))


def enforce_tags(cfg: dict, save_to_file: str | Path | None = None) -> None:
    """Warn when no experiment tags are set (reference requires them interactively)."""
    tags = cfg.get("tags")
    if not tags:
        log.warning("no tags provided in config (cfg.tags) — defaulting to ['dev']")
        cfg["tags"] = ["dev"]
    if save_to_file:
        Path(save_to_file).write_text(yaml.safe_dump(cfg.get("tags")))
