"""Parallelism: device meshes, sharding rules, multi-host collectives."""

from chimeralm_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
)


def __getattr__(name):
    import importlib

    if name in {"dist", "seq_parallel", "pipeline"}:
        module = importlib.import_module(f"chimeralm_tpu.parallel.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chimeralm_tpu.parallel' has no attribute {name!r}")
