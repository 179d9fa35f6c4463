"""Parallel layer tests: sharding rules, host striping, all-gather merge."""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_two_process_distributed_predict_matches_single(tmp_path):
    """True >=2-process run: jax.distributed.initialize over a local TCP
    coordinator, sharded predict through the CLI, merged output byte-identical
    to a single-process run (reference: configs/trainer/ddp_sim.yaml)."""
    import os
    import socket
    import subprocess
    import sys

    from chimeralm_tpu.models.hyena import tiny_config
    from chimeralm_tpu.models.lm import ChimeraLM, save_pretrained
    from chimeralm_tpu.runtime.writers import load_predictions_from_folder

    ckpt_dir = tmp_path / "ckpt"
    save_pretrained(ChimeraLM.new(seed=0, config=tiny_config(), example_len=64), ckpt_dir)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, CHIMERALM_PLATFORM="cpu", XLA_FLAGS="", JAX_PLATFORMS="")
    base = [
        sys.executable, "-m", "chimeralm_tpu", "predict", "tests/data/test_chimric_reads.bam",
        "--ckpt", str(ckpt_dir), "--mode", "fast",
    ]
    procs = [
        subprocess.Popen(
            base + ["-o", str(tmp_path / "multi"),
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2", "--process-id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "process 0/2" in outs[0] and "process 1/2" in outs[1]

    single = subprocess.run(
        base + ["-o", str(tmp_path / "single")],
        env=env, capture_output=True, timeout=600,
    )
    assert single.returncode == 0, single.stdout[-2000:]

    multi = load_predictions_from_folder(tmp_path / "multi")
    ref = load_predictions_from_folder(tmp_path / "single")
    assert len(ref) == 100
    assert multi == ref
    # both ranks actually contributed shard files
    ranks = {f.name.split("_")[0] for f in (tmp_path / "multi").glob("*.txt")}
    assert ranks == {"0", "1"}
