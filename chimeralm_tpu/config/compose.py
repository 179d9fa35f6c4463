"""Hydra-style YAML config composition (no hydra/omegaconf dependency).

Mirrors the reference's config system (reference: configs/train.yaml,
configs/eval.yaml and the group dirs data/ model/ trainer/ callbacks/
logger/ paths/ extras/ experiment/ debug/ hparams_search/):

* a root config lists ``defaults`` (group: option pairs, ``_self_``,
  optional ``null`` entries);
* group options are YAML files under ``<config_dir>/<group>/<option>.yaml``;
* ``# @package _global_`` headers merge at the root (experiment overlays);
* CLI overrides: ``group=option`` swaps a group file, ``a.b=c`` sets a leaf,
  ``+a.b=c`` adds one, ``~a.b`` deletes one;
* ``${a.b}`` interpolation resolves after the merge.

Composition order: earlier defaults are the base, later ones merge over it,
``_self_`` positions the root file's own keys.
"""

from __future__ import annotations

import copy
import re
from pathlib import Path
from typing import Any

import yaml

DEFAULT_CONFIG_DIR = Path(__file__).parent / "configs"

_INTERP = re.compile(r"\$\{([^}]+)\}")


class ConfigError(Exception):
    pass


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_yaml(path: Path) -> tuple[dict, bool]:
    """Returns (config, is_global_package)."""
    text = path.read_text()
    is_global = "@package _global_" in text.splitlines()[0] if text else False
    data = yaml.safe_load(text) or {}
    if not isinstance(data, dict):
        raise ConfigError(f"{path}: top level must be a mapping")
    return data, is_global


def _set_path(cfg: dict, dotted: str, value: Any, must_exist: bool | None = None):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            if must_exist:
                raise ConfigError(f"override path {dotted!r} not found")
            node[p] = {}
        node = node[p]
    leaf = parts[-1]
    if must_exist and leaf not in node:
        raise ConfigError(f"override path {dotted!r} not found in config")
    node[leaf] = value


def _del_path(cfg: dict, dotted: str):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.get(p, {})
    node.pop(parts[-1], None)


def _get_path(cfg: dict, dotted: str):
    node = cfg
    for p in dotted.split("."):
        if not isinstance(node, dict) or p not in node:
            raise KeyError(dotted)
        node = node[p]
    return node


def _parse_value(raw: str) -> Any:
    return yaml.safe_load(raw)


def _resolve_interpolations(cfg: dict) -> dict:
    def resolve(value, root, depth=0):
        if depth > 10:
            raise ConfigError("interpolation depth exceeded (cycle?)")
        if isinstance(value, str):
            matches = _INTERP.findall(value)
            if not matches:
                return value
            if len(matches) == 1 and value == "${" + matches[0] + "}":
                return resolve(_get_path(root, matches[0]), root, depth + 1)

            def sub(m):
                return str(resolve(_get_path(root, m.group(1)), root, depth + 1))

            return _INTERP.sub(sub, value)
        if isinstance(value, dict):
            return {k: resolve(v, root, depth) for k, v in value.items()}
        if isinstance(value, list):
            return [resolve(v, root, depth) for v in value]
        return value

    return resolve(cfg, cfg)


def _compose_sibling(config_dir, group: str, option: str, _seen: frozenset = frozenset()):
    """Compose one group option with its bare-string sibling defaults,
    recursively (earlier defaults are the base, the file's own keys win).

    Returns ``(content, is_global)`` with ``is_global`` taken from the named
    option's own ``@package _global_`` flag.  Dict-form entries in a
    sibling's defaults (cross-group overrides) are not supported at this
    depth — only the directly-selected group file may carry them.
    """
    if option in _seen:
        raise ConfigError(f"circular sibling defaults in group {group!r}: {option}")
    path = config_dir / group / f"{option}.yaml"
    if not path.exists():
        raise ConfigError(f"sibling default not found: {path}")
    content, is_global = _load_yaml(path)
    base: dict = {}
    for sd in content.pop("defaults", []):
        if sd == "_self_":
            continue
        if not isinstance(sd, str):
            raise ConfigError(
                f"{path}: dict-form defaults entries are only supported in the "
                f"directly-selected group file, not in sibling {option!r}"
            )
        sib, _ = _compose_sibling(config_dir, group, sd, _seen | {option})
        base = _deep_merge(base, sib)
    return _deep_merge(base, content), is_global


def compose(
    config_name: str = "train",
    overrides: list[str] | None = None,
    config_dir: str | Path | None = None,
    resolve: bool = True,
) -> dict:
    """Compose a root config with group defaults and CLI-style overrides."""
    config_dir = Path(config_dir) if config_dir else DEFAULT_CONFIG_DIR
    overrides = list(overrides or [])

    root_file = config_dir / f"{config_name}.yaml"
    if not root_file.exists():
        raise ConfigError(f"config {root_file} not found")
    root_cfg, _ = _load_yaml(root_file)
    defaults = root_cfg.pop("defaults", [])

    # group overrides (group=option) adjust the defaults list before loading
    group_overrides: dict[str, str | None] = {}
    value_overrides: list[tuple[str, str, Any]] = []
    for ov in overrides:
        if ov.startswith("~"):
            value_overrides.append(("del", ov[1:], None))
            continue
        additive = ov.startswith("+")
        body = ov[1:] if additive else ov
        if "=" not in body:
            raise ConfigError(f"bad override {ov!r}")
        key, raw = body.split("=", 1)
        value = _parse_value(raw)
        group_file = config_dir / key / f"{value}.yaml" if isinstance(value, str) else None
        if "." not in key and (config_dir / key).is_dir() and (value is None or group_file and group_file.exists()):
            group_overrides[key] = value
        else:
            value_overrides.append(("add" if additive else "set", key, value))

    cfg: dict = {}
    self_merged = False
    seen_groups = set()
    for entry in defaults:
        if entry == "_self_":
            cfg = _deep_merge(cfg, root_cfg)
            self_merged = True
            continue
        if isinstance(entry, str):
            entry = {entry: None}
        (group, option), = entry.items()
        group = group.lstrip("/").replace("optional ", "")
        seen_groups.add(group)
        if group in group_overrides:
            option = group_overrides[group]
        if option is None:
            continue
        path = config_dir / group / f"{option}.yaml"
        if not path.exists():
            raise ConfigError(f"group option not found: {path}")
        sub, is_global = _load_yaml(path)
        sub_defaults = sub.pop("defaults", [])
        # group files may themselves override other groups ("override /model: cnn")
        for sd in sub_defaults:
            if sd == "_self_":
                continue
            if isinstance(sd, str):
                # hydra semantics: a bare string in a group file's defaults
                # names a SIBLING option of the same group (e.g.
                # trainer/ddp.yaml "defaults: [default]" inherits
                # trainer/default.yaml; logger/many_loggers.yaml composes
                # its sibling sinks).  Chains recurse (pp_8dev -> pp ->
                # default); cycles error out.
                s2, glob2 = _compose_sibling(config_dir, group, sd)
                cfg = _deep_merge(cfg, s2 if glob2 else {group: s2})
                continue
            (g2, o2), = sd.items()
            is_override = "override" in g2
            g2 = g2.replace("override", "").strip().lstrip("/")
            if g2 in group_overrides:
                o2 = group_overrides[g2]  # CLI group choice beats experiment's
            if o2 is not None:
                p2 = config_dir / g2 / f"{o2}.yaml"
                s2, glob2 = _load_yaml(p2)
                s2.pop("defaults", None)
                if glob2:
                    cfg = _deep_merge(cfg, s2)
                elif is_override and g2 in seen_groups:
                    # hydra semantics: overriding a group REPLACES its node
                    # (merging would leave keys of the default option behind,
                    # e.g. hyena's `config` leaking into the cnn model node)
                    cfg[g2] = copy.deepcopy(s2)
                else:
                    cfg = _deep_merge(cfg, {g2: s2})
        cfg = _deep_merge(cfg, sub if is_global else {group: sub})
    if not self_merged:
        cfg = _deep_merge(cfg, root_cfg)

    # group overrides for groups not in defaults (e.g. experiment=hyena with
    # "- experiment: null" handled above; or entirely new groups)
    for group, option in group_overrides.items():
        if group in seen_groups or option is None:
            continue
        path = config_dir / group / f"{option}.yaml"
        sub, is_global = _load_yaml(path)
        sub.pop("defaults", None)
        cfg = _deep_merge(cfg, sub if is_global else {group: sub})

    for action, key, value in value_overrides:
        if action == "del":
            _del_path(cfg, key)
        elif action == "add":
            _set_path(cfg, key, value)
        else:
            _set_path(cfg, key, value)

    if resolve:
        cfg = _resolve_interpolations(cfg)
    return cfg


def to_yaml(cfg: dict) -> str:
    return yaml.safe_dump(cfg, sort_keys=False)
