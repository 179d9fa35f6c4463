"""torch -> Flax checkpoint conversion for ChimeraLM / HyenaDNA weights.

The production weights live on the HF hub (``yangliz5/chimeralm``, pushed by
reference: scripts/model2hub.py:33-34) as a torch state dict whose backbone
keys come from the ``LongSafari/hyenadna-*-hf`` remote code.  This module
maps those names onto the parameter tree of
``chimeralm_tpu.models.hyena.HyenaDnaClassifier``.

Layout rules:

* ``nn.Linear.weight`` (out, in)            -> Dense ``kernel`` (in, out): transpose
* ``nn.Embedding.weight``                   -> Embed ``embedding``: unchanged
* ``nn.LayerNorm.weight/bias``              -> ``scale``/``bias``
* depthwise ``Conv1d.weight`` (C, 1, W)     -> ``short_filter_weight``: unchanged
* fixed buffers (``pos_emb.z/t``, ``modulation.deltas``) are recomputed in
  Flax and skipped here.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


# keys that are deterministic buffers recomputed by the Flax model
_SKIP_PATTERNS = [
    r"\.pos_emb\.(z|t)$",
    r"\.modulation\.deltas$",
    r"num_batches_tracked$",
]


def _assign(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _map_key(key: str) -> tuple[list[str], str] | None:
    """Map one torch state-dict key to (flax path, transform).

    transform: "linear" (transpose 2D), "none".
    Returns None for keys to skip.
    """
    for pat in _SKIP_PATTERNS:
        if re.search(pat, key):
            return None

    k = key
    if k.startswith("net."):
        k = k[4:]
    # HyenaDna wraps the HF model as .backbone; the HF model's own top module
    # is also called backbone -> collapse "backbone.backbone." to "backbone.".
    k = k.replace("backbone.backbone.", "backbone.", 1)
    # HF embeddings submodule: backbone.embeddings.word_embeddings -> word_embeddings
    k = k.replace("backbone.embeddings.word_embeddings", "backbone.word_embeddings", 1)

    parts = k.split(".")
    # layers.{i} -> layers_{i}
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("layers", "implicit_filter", "attention", "classifier") and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1

    leaf = out[-1]
    parent = out[-2] if len(out) >= 2 else ""

    # short depthwise conv keeps torch layout
    if parent == "short_filter":
        out = out[:-2] + [f"short_filter_{leaf}"]
        return out, "none"

    if leaf == "freq":
        return out, "none"

    if leaf == "weight":
        if parent == "word_embeddings":
            return out[:-1] + ["embedding"], "none"
        if parent.startswith(("norm", "ln_f")) or parent in ("ln_f",):
            return out[:-1] + ["scale"], "none"
        # everything else with a 2D weight is a Linear
        return out[:-1] + ["kernel"], "linear"

    if leaf == "bias":
        return out, "none"

    # filter_fn.bias handled above ("bias" leaf); unknown leaves pass through
    return out, "none"


def convert_state_dict(state_dict: dict[str, np.ndarray]) -> dict:
    """Convert a torch state dict (numpy values) into a Flax param tree."""
    params: dict = {}
    for key, value in state_dict.items():
        mapped = _map_key(key)
        if mapped is None:
            continue
        path, transform = mapped
        value = np.asarray(value)
        if transform == "linear":
            if value.ndim != 2:
                raise ValueError(f"{key}: expected 2D linear weight, got {value.shape}")
            value = value.T
        _assign(params, path, value)
    return params


def _flatten(tree: dict, prefix=()) -> dict[tuple, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def validate_against(params_converted: dict, params_reference: dict) -> list[str]:
    """Compare tree structure/shapes; returns a list of mismatch descriptions."""
    a = _flatten(params_converted)
    b = _flatten(params_reference)
    problems = []
    for k in sorted(set(a) | set(b)):
        if k not in a:
            problems.append(f"missing in converted: {'/'.join(k)}")
        elif k not in b:
            problems.append(f"unexpected in converted: {'/'.join(k)}")
        elif tuple(np.shape(a[k])) != tuple(np.shape(b[k])):
            problems.append(
                f"shape mismatch at {'/'.join(k)}: {np.shape(a[k])} vs {np.shape(b[k])}"
            )
    return problems


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Read a checkpoint file (.safetensors / .pt / .bin / .ckpt) into numpy."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]  # Lightning .ckpt
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def convert_checkpoint(path: str | Path) -> dict:
    """File -> Flax params in one call."""
    return convert_state_dict(load_torch_state_dict(path))
