"""Offline accuracy harness: the trainer must learn synthetic WGA chimeras.

Stand-in for the reference's eval.py accuracy runs on held-out data
(checkpoint F1s in BASELINE.md): the synthetic junction-detection task is
learnable, so a correctly wired model+trainer reaching high val F1 is an
end-to-end correctness signal, not just a smoke test.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))


@pytest.mark.slow
def test_train_reaches_high_f1_on_synthetic(tmp_path):
    import make_synthetic_dataset as synth

    from chimeralm_tpu.data.datamodule import ParquetDataModule
    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.models.hyena import HyenaDnaClassifier, tiny_config
    from chimeralm_tpu.runtime.task import ClassificationTask
    from chimeralm_tpu.runtime.trainer import Trainer, TrainerConfig

    data = synth.generate(400, tmp_path / "synth.parquet", seed=0)
    tok = CharacterTokenizer(model_max_length=512, padding_side="left")
    dm = ParquetDataModule(
        tok,
        train_data_path=data,
        batch_size=32,
        train_val_test_split=(0.8, 0.1, 0.1),
        pad_to_multiple_of=64,
    )
    cfg = tiny_config(embed_dropout=0.0, max_seq_len=1024)
    # tiny_config caps max_seq_len=512 grids; synthetic reads reach 2000 bases
    # but tokenizer truncates to 510 — keep within the positional grid
    model = HyenaDnaClassifier(cfg)
    task = ClassificationTask(model, learning_rate=1e-3)
    trainer = Trainer(
        task,
        TrainerConfig(max_epochs=12, early_stop_patience=100, seed=0, learning_rate=1e-3, drop_last=True),
        ckpt_dir=tmp_path / "ckpt",
    )
    trainer.fit(dm)
    val_f1 = trainer.callback_metrics["val/f1"]
    assert val_f1 > 0.8, trainer.callback_metrics

    # test on the held-out split, restoring from checkpoint to also exercise
    # the restore path
    import jax
    import jax.numpy as jnp

    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 64), jnp.int32))
    state, _ = trainer.load_checkpoint(state, tmp_path / "ckpt/last.ckpt.msgpack")
    metrics = trainer.test(state.params, dm)
    assert metrics["test/f1"] > 0.7, metrics
