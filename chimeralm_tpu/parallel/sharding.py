"""Parameter/batch sharding rules for the dp x tp mesh.

The flagship model is ~4M params, so weights comfortably replicate; the
``tp`` axis exists to demonstrate/exercise megatron-style sharding of the
wide matmuls (and to scale to larger Hyena configs).  Rules:

* column-parallel (output-dim sharded): ``in_proj``, ``fc1``, head
  ``attention_0``/``classifier_*`` first matmul;
* row-parallel (input-dim sharded): ``out_proj``, ``fc2`` — XLA inserts the
  psum when the result is consumed replicated;
* everything else replicated.

Batch arrays shard their leading dim over ``dp``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("in_proj", "fc1", "attention_0", "classifier_0", "layers_0")
_ROW_PARALLEL = ("out_proj", "fc2", "classifier_3", "layers_3")


def param_pspec(path: tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter, by module-path rules."""
    names = [p for p in path]
    leaf_name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if leaf_name == "kernel" and getattr(leaf, "ndim", 0) == 2:
        if parent in _COLUMN_PARALLEL:
            return P(None, "tp")
        if parent in _ROW_PARALLEL:
            return P("tp", None)
    if leaf_name == "bias" and parent in _COLUMN_PARALLEL and getattr(leaf, "ndim", 0) == 1:
        return P("tp")
    return P()


def param_shardings(params, mesh: Mesh):
    """Tree of NamedShardings for a param tree (tp axis optional)."""
    has_tp = "tp" in mesh.axis_names

    def spec_for(path, leaf):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        spec = param_pspec(keys, leaf) if has_tp else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """device_put the param tree with rule-based shardings."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )


def batch_shardings(batch, mesh: Mesh, axis: str = "dp"):
    return jax.tree.map(lambda _x: NamedSharding(mesh, P(axis)), batch)
