"""Parallel layer tests: sharding rules, host striping, all-gather merge."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from chimeralm_tpu.parallel.dist import (
    all_gather_logits,
    merge_prediction_folders,
    shard_reads_for_host,
)
from chimeralm_tpu.parallel.mesh import make_mesh
from chimeralm_tpu.parallel.sharding import param_pspec, shard_params


def test_shard_reads_striping():
    reads = list(range(10))
    shards = [list(shard_reads_for_host(reads, pi, 3)) for pi in range(3)]
    assert sorted(sum(shards, [])) == reads
    assert shards[0] == [0, 3, 6, 9]


def test_all_gather_logits():
    mesh = make_mesh(4, axis_names=("dp",))
    local = np.arange(8 * 2, dtype=np.float32).reshape(8, 2)
    x = jax.device_put(local, NamedSharding(mesh, P("dp")))
    gathered = all_gather_logits(x, mesh)
    np.testing.assert_array_equal(np.asarray(gathered), local)


def test_merge_prediction_folders(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    (a / "0_0.txt").write_text("r1\t0\nr2\t1\n")
    (b / "1_0.txt").write_text("r3\t1\n")
    n = merge_prediction_folders([a, b], tmp_path / "merged.txt")
    assert n == 3
    lines = sorted((tmp_path / "merged.txt").read_text().strip().splitlines())
    assert lines == ["r1\t0", "r2\t1", "r3\t1"]


def test_param_pspec_rules():
    k2 = np.zeros((4, 8))
    assert param_pspec(("layers_0", "mixer", "in_proj", "kernel"), k2) == P(None, "tp")
    assert param_pspec(("layers_0", "mixer", "out_proj", "kernel"), k2) == P("tp", None)
    assert param_pspec(("layers_0", "norm1", "scale"), np.zeros(4)) == P()


def test_shard_params_places_on_mesh():
    from chimeralm_tpu.models.hyena import HyenaBackbone, tiny_config

    mesh = make_mesh(8, axis_names=("dp", "tp"), shape=(4, 2))
    bb = HyenaBackbone(tiny_config())
    params = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32))["params"]
    sharded = shard_params(params, mesh)
    kernel = sharded["layers_0"]["mixer"]["in_proj"]["kernel"]
    assert kernel.sharding.spec == P(None, "tp")
    out = np.asarray(bb.apply({"params": sharded}, jnp.zeros((2, 32), jnp.int32)))
    assert np.isfinite(out).all()


def test_profiling_stage_timer():
    from chimeralm_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("tokenize", 100):
        pass
    rep = t.report()
    assert rep["tokenize"]["items"] == 100
