"""Config composition + instantiation + entry-point tests."""

import numpy as np
import pytest

from chimeralm_tpu.config import compose
from chimeralm_tpu.utils import instantiate


def test_compose_train_defaults():
    cfg = compose("train")
    assert cfg["task_name"] == "train"
    assert cfg["data"]["_target_"].endswith("ParquetDataModule")
    assert cfg["model"]["model"]["_target_"].endswith("HyenaDnaClassifier")
    assert cfg["trainer"]["config"]["max_epochs"] == 100
    # interpolation resolved
    assert cfg["trainer"]["config"]["seed"] == 42
    assert cfg["trainer"]["config"]["learning_rate"] == 1e-4
    assert "logs" in cfg["paths"]["output_dir"]


def test_compose_group_override():
    cfg = compose("train", ["model=cnn", "data.batch_size=7", "seed=7"])
    assert cfg["model"]["model"]["_target_"].endswith("DNAConvNet")
    assert cfg["data"]["batch_size"] == 7
    assert cfg["trainer"]["config"]["seed"] == 7


def test_compose_experiment_overlay():
    cfg = compose("train", ["experiment=hyena"])
    assert cfg["tags"] == ["hyena", "fq"]
    assert cfg["data"]["batch_size"] == 24
    assert cfg["model"]["model"]["_target_"].endswith("HyenaDnaClassifier")


def test_compose_debug_overlay():
    cfg = compose("train", ["debug=fdr"])
    assert cfg["trainer"]["config"]["fast_dev_run"] is True
    assert cfg["task_name"] == "debug"


def test_compose_add_and_delete():
    cfg = compose("train", ["+data.extra_key=5", "~test"])
    assert cfg["data"]["extra_key"] == 5
    assert "test" not in cfg


def test_instantiate_task_from_config():
    cfg = compose("train", ["model=hyena"])
    task = instantiate(cfg["model"])
    from chimeralm_tpu.runtime.task import ClassificationTask

    assert isinstance(task, ClassificationTask)
    assert task.model.config.d_model == 256


def test_train_entry_fast_dev_run(tmp_path):
    """python train.py debug=fdr on the parquet fixture end-to-end."""
    import train as train_entry

    result = train_entry.main(
        [
            "debug=fdr",
            "data.train_data_path=tests/data/tests.parquet",
            "data.tokenizer.model_max_length=128",
            "data.batch_size=8",
            "data.num_workers=0",
            "model.model.config._target_=chimeralm_tpu.models.hyena.tiny_config",
            f"paths.root_dir={tmp_path}",
            "test=false",
            "extras.print_config=false",
        ]
    )
    assert result is None or np.isfinite(result)


def test_eval_entry_test_loop(tmp_path):
    """train 1 epoch, then eval the saved checkpoint via eval.py."""
    import eval as eval_entry
    import train as train_entry

    common = [
        "data.train_data_path=tests/data/tests.parquet",
        "data.tokenizer.model_max_length=128",
        "data.batch_size=8",
        "data.num_workers=0",
        "model.model.config._target_=chimeralm_tpu.models.hyena.tiny_config",
        f"paths.root_dir={tmp_path}",
        "extras.print_config=false",
    ]
    train_entry.main(["debug=default", "test=false", *common])
    ckpt = tmp_path / "logs/debug/runs/checkpoints/last.ckpt.msgpack"
    assert ckpt.exists()
    eval_entry.main([f"ckpt_path={ckpt}", *common])


@pytest.mark.parametrize("name", ["hyena", "cnn", "transformer", "mamba", "mambasp", "striped_hyena"])
def test_all_model_configs_instantiate(name):
    cfg = compose("train", [f"model={name}"])
    task = instantiate(cfg["model"])
    from chimeralm_tpu.runtime.task import ClassificationTask

    assert isinstance(task, ClassificationTask)
    assert task.model is not None


def test_eval_entry_predict_branch(tmp_path):
    """eval.py with predict_data_path runs the writer path end-to-end."""
    import eval as eval_entry
    import train as train_entry

    common = [
        "data.train_data_path=tests/data/tests.parquet",
        "data.tokenizer.model_max_length=128",
        "data.batch_size=8",
        "data.num_workers=0",
        "model.model.config._target_=chimeralm_tpu.models.hyena.tiny_config",
        f"paths.root_dir={tmp_path}",
        "extras.print_config=false",
    ]
    train_entry.main(["debug=fdr", "test=false", *common])
    ckpt = tmp_path / "logs/debug/runs/checkpoints/last.ckpt.msgpack"
    assert ckpt.exists()
    eval_entry.main(
        [
            f"ckpt_path={ckpt}",
            "+data.predict_data_path=tests/data/test_predict.parquet",
            *common,
        ]
    )
    pred_dir = tmp_path / "logs/eval/runs/predictions"
    from chimeralm_tpu.runtime.writers import load_predictions_from_folder

    preds = load_predictions_from_folder(pred_dir)
    assert len(preds) == 25


def test_experiment_group_override_replaces_node():
    """`override /model:` in an experiment REPLACES the group node (hydra
    semantics); deep-merging left the default option's keys behind and broke
    experiment=cnn/transformer/mamba at the CLI (round-2 regression test)."""
    from chimeralm_tpu.config.compose import compose

    cfg = compose("train", ["experiment=cnn"])
    assert cfg["model"]["model"]["_target_"].endswith("DNAConvNet")
    # no hyena keys leaked into the cnn node
    assert "config" not in cfg["model"]["model"]

    for exp, target in [
        ("hyena", "HyenaDnaClassifier"),
        ("transformer", "SequenceCNNTransformer"),
        ("mamba", "MambaSequenceClassification"),
    ]:
        c = compose("train", [f"experiment={exp}"])
        assert c["model"]["model"]["_target_"].endswith(target), exp


def test_cli_group_choice_beats_experiment_override():
    from chimeralm_tpu.config.compose import compose

    cfg = compose("train", ["experiment=cnn", "model=transformer"])
    assert cfg["model"]["model"]["_target_"].endswith("SequenceCNNTransformer")


def test_train_entry_pipeline_parallel(tmp_path):
    """trainer=pp end-to-end: one fast-dev epoch through the GPipe task."""
    import train as train_entry

    result = train_entry.main(
        [
            "debug=fdr",
            "trainer=pp",
            "trainer.devices=2",
            "trainer.pp_n_micro=2",
            "trainer.force_platform=cpu",
            "data.train_data_path=tests/data/tests.parquet",
            "data.tokenizer.model_max_length=128",
            "data.batch_size=8",
            "data.num_workers=0",
            "model.model.config._target_=chimeralm_tpu.models.hyena.tiny_config",
            "model.model.config.fft_method=matmul",
            f"paths.root_dir={tmp_path}",
            "test=false",
            "extras.print_config=false",
        ]
    )
    assert result is None or np.isfinite(result)


def test_group_file_sibling_defaults_compose():
    """A bare string in a group file's defaults loads the SIBLING option
    (hydra semantics): trainer/ddp.yaml's `defaults: [default]` must pull in
    trainer/default.yaml's TrainerConfig node, and logger/many_loggers.yaml
    composes its sibling sinks."""
    from chimeralm_tpu.config import compose

    for option in ("ddp", "cpu", "tpu_pod", "pp", "ddp_sim"):
        cfg = compose("train", [f"trainer={option}"])
        node = cfg["trainer"]
        assert node.get("config", {}).get("_target_", "").endswith("TrainerConfig"), option
    cfg = compose("train", ["logger=many_loggers"])
    assert {"csv", "tensorboard"} <= set(cfg["logger"] or {})


def test_sibling_defaults_chain_recursively(tmp_path):
    """Sibling inheritance follows chains (a -> b -> base) and rejects cycles."""
    from chimeralm_tpu.config import compose
    from chimeralm_tpu.config.compose import ConfigError

    (tmp_path / "grp").mkdir()
    (tmp_path / "root.yaml").write_text("defaults:\n  - grp: a\n")
    (tmp_path / "grp/base.yaml").write_text("x: 1\ny: base\n")
    (tmp_path / "grp/b.yaml").write_text("defaults:\n  - base\ny: b\nz: 2\n")
    (tmp_path / "grp/a.yaml").write_text("defaults:\n  - b\nz: 3\n")
    cfg = compose("root", [], config_dir=tmp_path)
    assert cfg["grp"] == {"x": 1, "y": "b", "z": 3}

    (tmp_path / "grp/c.yaml").write_text("defaults:\n  - d\n")
    (tmp_path / "grp/d.yaml").write_text("defaults:\n  - c\n")
    (tmp_path / "root2.yaml").write_text("defaults:\n  - grp: c\n")
    with pytest.raises(ConfigError, match="circular"):
        compose("root2", [], config_dir=tmp_path)
