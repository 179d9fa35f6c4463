"""Trainer + datamodule integration tests on the reference parquet fixture."""

import numpy as np
import pytest

from chimeralm_tpu.data.datamodule import BamDataModule, FastqDataModule, ParquetDataModule
from chimeralm_tpu.data.tokenizer import CharacterTokenizer
from chimeralm_tpu.models.hyena import HyenaDnaClassifier, tiny_config
from chimeralm_tpu.runtime.task import ClassificationTask
from chimeralm_tpu.runtime.trainer import CsvLogger, Trainer, TrainerConfig

PARQUET = "tests/data/tests.parquet"


def make_dm(batch_size=12, mml=100):
    tok = CharacterTokenizer(model_max_length=mml, padding_side="left")
    return ParquetDataModule(
        tok,
        train_data_path=PARQUET,
        batch_size=batch_size,
        train_val_test_split=(0.8, 0.1, 0.1),
    )


def test_parquet_datamodule_shapes():
    dm = make_dm()
    dm.setup("fit")
    batch = next(iter(dm.train_batches(0)))
    # golden from reference: mml=100 -> tokens truncated to 98
    assert batch["input_ids"].shape == (12, 98)
    assert batch["labels"].shape == (12,)
    assert set(batch["labels"].tolist()) <= {0, 1}
    # attention_mask marks real tokens (masked pooling in training must see
    # the same mask semantics as the fast predict path: ids != PAD)
    assert batch["attention_mask"].shape == (12, 98)
    np.testing.assert_array_equal(batch["attention_mask"], (batch["input_ids"] != 4).astype(np.int32))
    # splits partition 25 rows as 20/5/... (80%/10%/10% with floor semantics)
    assert len(dm.data["train"]) == 20
    dm.setup("test")
    assert len(dm.data["val"]) + len(dm.data["test"]) == 5


def test_bam_datamodule_predict():
    tok = CharacterTokenizer(model_max_length=200)
    dm = BamDataModule(tok, predict_data_path="tests/data/test_chimric_reads.bam", batch_size=4)
    dm.setup("predict")
    assert len(dm.data["predict"]) == 100
    feat = dm.data["predict"][0]
    assert feat["labels"] == -1 and len(feat["id"]) == 256


def test_fastq_datamodule():
    tok = CharacterTokenizer(model_max_length=200)
    dm = FastqDataModule(tok, train_data_path="tests/data/test.fastq", batch_size=4)
    dm.data["train"] = dm._tokenize_split("train")
    assert len(dm.data["train"]) > 0


@pytest.mark.nightly
def test_trainer_overfit_and_checkpoint(tmp_path):
    """Overfit 2 batches of the fixture; verify checkpointing + resume."""
    dm = make_dm(batch_size=8, mml=256)
    model = HyenaDnaClassifier(tiny_config(embed_dropout=0.0))
    task = ClassificationTask(model, learning_rate=1e-3)
    cfg = TrainerConfig(
        max_epochs=150,
        early_stop_patience=1000,
        drop_last=False,
        overfit_batches=2,
        seed=0,
        learning_rate=1e-3,
    )
    trainer = Trainer(task, cfg, ckpt_dir=tmp_path, loggers=[CsvLogger(tmp_path / "metrics.csv")])
    state = trainer.fit(dm)

    assert trainer.callback_metrics["train/loss"] < 0.1, trainer.callback_metrics
    assert (tmp_path / "last.ckpt.msgpack").exists()
    assert trainer.best_ckpt_path is not None and trainer.best_ckpt_path.exists()
    assert (tmp_path / "metrics.csv").exists()

    # resume from last: epoch counter continues, params load
    cfg2 = TrainerConfig(max_epochs=151, overfit_batches=2, drop_last=False, seed=0, learning_rate=1e-3, early_stop_patience=1000)
    trainer2 = Trainer(task, cfg2, ckpt_dir=tmp_path)
    trainer2.fit(dm, ckpt_path=tmp_path / "last.ckpt.msgpack")
    assert trainer2.callback_metrics["epoch"] == 150

    # test loop produces precision/recall
    metrics = trainer2.test(state.params, dm)
    assert {"test/loss", "test/f1", "test/precision", "test/recall"} <= set(metrics)


def test_fast_dev_run(tmp_path):
    dm = make_dm(batch_size=4, mml=64)
    model = HyenaDnaClassifier(tiny_config())
    task = ClassificationTask(model)
    trainer = Trainer(task, TrainerConfig(fast_dev_run=True), ckpt_dir=tmp_path)
    trainer.fit(dm)
    assert trainer.callback_metrics["epoch"] == 0


def test_kmer_tokenizer_datamodule():
    from chimeralm_tpu.data.tokenizer import KmerTokenizer

    tok = KmerTokenizer(k=3, model_max_length=128, padding_side="left")
    dm = ParquetDataModule(tok, train_data_path=PARQUET, batch_size=4)
    dm.setup("fit")
    batch = next(iter(dm.train_batches(0)))
    assert batch["input_ids"].shape[0] == 4
    assert batch["input_ids"].max() >= 7  # k-mer ids


def test_tensorboard_logger(tmp_path):
    from chimeralm_tpu.utils.loggers import TensorBoardLogger

    lg = TensorBoardLogger(str(tmp_path), name="t")
    lg.log_metrics({"val/f1": 0.5, "skip": "str"}, step=1)
    lg.log_hyperparams({"lr": 1e-4})
    assert list((tmp_path / "t").iterdir())


def test_trainer_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax-format checkpoints save/restore the full TrainState (SURVEY §5)."""
    import jax
    import jax.numpy as jnp

    dm = make_dm(batch_size=8, mml=256)
    model = HyenaDnaClassifier(tiny_config(embed_dropout=0.0))
    task = ClassificationTask(model, learning_rate=1e-3)
    cfg = TrainerConfig(
        max_epochs=1, overfit_batches=1, limit_val_batches=1, seed=0,
        learning_rate=1e-3, checkpoint_format="orbax",
    )
    trainer = Trainer(task, cfg, ckpt_dir=tmp_path / "ck")
    state = trainer.fit(dm)
    last = tmp_path / "ck" / "last.ckpt.orbax"
    assert last.is_dir()

    fresh = task.init_state(jax.random.PRNGKey(1), jnp.zeros((1, 64), jnp.int32))
    restored, meta = trainer.load_checkpoint(fresh, last)
    assert int(restored.step) == int(state.step) > 0
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta.get("epoch") == 0


def test_load_params_only_checkpoint(tmp_path):
    """Params-only exports (scripts/train_flagship.py) restore cleanly."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    model = HyenaDnaClassifier(tiny_config(embed_dropout=0.0))
    task = ClassificationTask(model, learning_rate=1e-3)
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))
    path = tmp_path / "params_only.ckpt.msgpack"
    path.write_bytes(flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(
            {"params": jax.tree.map(np.asarray, state.params), "step": 7}
        )
    ))
    trainer = Trainer(task, TrainerConfig(), ckpt_dir=tmp_path)
    fresh = task.init_state(jax.random.PRNGKey(5), jnp.zeros((1, 64), jnp.int32))
    restored, _ = trainer.load_checkpoint(fresh, path)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_bare_params_export(tmp_path):
    """A from_pretrained ``flax_params.msgpack`` (bare params tree, no
    TrainState wrapper) seeds a fresh state — the --seed-from export path."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    model = HyenaDnaClassifier(tiny_config(embed_dropout=0.0))
    task = ClassificationTask(model, learning_rate=1e-3)
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))
    path = tmp_path / "flax_params.msgpack"
    path.write_bytes(flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(jax.tree.map(np.asarray, state.params))
    ))
    trainer = Trainer(task, TrainerConfig(), ckpt_dir=tmp_path)
    fresh = task.init_state(jax.random.PRNGKey(5), jnp.zeros((1, 64), jnp.int32))
    restored, _ = trainer.load_checkpoint(fresh, path)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_checkpoint_across_optimizer_recipes(tmp_path):
    """A full ckpt saved under one optimizer recipe seeds params into another.

    The curriculum reruns seed from checkpoints written with an older
    ``make_adamw_grouped`` group layout; a structure mismatch must fall back
    to a fresh opt_state instead of raising.
    """
    import jax
    import jax.numpy as jnp

    from chimeralm_tpu.runtime.optim import make_adamw_grouped

    model = HyenaDnaClassifier(tiny_config(embed_dropout=0.0))
    old_task = ClassificationTask(
        model, optimizer=make_adamw_grouped(1e-3, 0.01, filter_lr_scale=0.5)
    )
    old_trainer = Trainer(old_task, TrainerConfig(), ckpt_dir=tmp_path)
    old_state = old_task.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))
    old_trainer.save_checkpoint(old_state, "full", {"epoch": 3})

    new_task = ClassificationTask(
        model,
        optimizer=make_adamw_grouped(1e-3, 0.01, head_lr_scale=10.0, warmup_steps=5,
                                     clip_norm=1.0),
    )
    new_trainer = Trainer(new_task, TrainerConfig(), ckpt_dir=tmp_path)
    fresh = new_task.init_state(jax.random.PRNGKey(5), jnp.zeros((1, 64), jnp.int32))
    restored, meta = new_trainer.load_checkpoint(fresh, tmp_path / "full.ckpt.msgpack")
    assert meta.get("epoch") == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(old_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.nightly
def test_orbax_sharded_checkpoint_preserves_shardings(tmp_path):
    """Sharded orbax save -> restore on a dp x tp mesh: leaves keep their
    NamedShardings (no host gather) and values round-trip exactly.

    The distributed-checkpoint path of SURVEY §5 — the reference has only
    Lightning's single-file torch checkpoints.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from chimeralm_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, axis_names=("dp", "tp"), shape=(4, 2))
    model = HyenaDnaClassifier(tiny_config(embed_dropout=0.0))
    task = ClassificationTask(model, learning_rate=1e-3)
    example = jnp.zeros((1, 64), jnp.int32)
    with mesh:
        state = task.sharded_state(jax.random.PRNGKey(0), example, mesh)

    cfg = TrainerConfig(checkpoint_format="orbax")
    trainer = Trainer(task, cfg, mesh=mesh, ckpt_dir=tmp_path / "ck")
    path = trainer.save_checkpoint(state, "sharded", {"epoch": 3})

    # some tp-rule leaves must actually be partitioned (not all replicated)
    def is_partitioned(x):
        s = getattr(x, "sharding", None)
        return isinstance(s, NamedSharding) and any(p is not None for p in (s.spec or ()))

    n_part = sum(bool(is_partitioned(x)) for x in jax.tree.leaves(state.params))
    assert n_part > 0

    with mesh:
        fresh = task.sharded_state(jax.random.PRNGKey(7), example, mesh)
        restored, meta = trainer.load_checkpoint(fresh, path)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        assert a.sharding == b.sharding, (a.sharding, b.sharding)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state (Adam moments) kept its shardings too
    for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)):
        if hasattr(b, "sharding"):
            assert a.sharding == b.sharding


@pytest.mark.nightly
def test_resume_reproduces_uninterrupted_metrics(tmp_path):
    """fit(3 epochs) == fit(2 epochs) + resume-from-last(1 epoch), exactly.

    Deterministic data order (epoch-seeded) + restored optimizer/scheduler/
    stopper state make the resumed epoch bit-reproducible.
    """
    dm = make_dm(batch_size=8, mml=128)
    model = HyenaDnaClassifier(tiny_config(embed_dropout=0.0, head_dropout=0.0))

    def run(ckpt_dir, max_epochs, resume=None):
        task = ClassificationTask(model, learning_rate=1e-3)
        cfg = TrainerConfig(
            max_epochs=max_epochs, seed=0, learning_rate=1e-3,
            limit_train_batches=2, limit_val_batches=1,
            checkpoint_format="orbax",
        )
        trainer = Trainer(task, cfg, ckpt_dir=ckpt_dir)
        trainer.fit(dm, ckpt_path=resume)
        return trainer

    full = run(tmp_path / "full", 3)
    part = run(tmp_path / "part", 2)
    resumed = run(tmp_path / "part", 3, resume=tmp_path / "part" / "last.ckpt.orbax")

    for key in ("train/loss", "val/loss", "val/f1", "train/f1"):
        np.testing.assert_allclose(
            resumed.callback_metrics[key], full.callback_metrics[key], rtol=1e-6,
            err_msg=key,
        )
