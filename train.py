"""Hydra-style training entry point.

Usage (reference parity: train.py):

    python train.py experiment=hyena data.train_data_path=... trainer=ddp
    python train.py debug=fdr
    python train.py hparams_search=optuna   # sweep

Composes ``chimeralm_tpu/config/configs/train.yaml``, instantiates the
datamodule/task/trainer, fits, optionally tests on the best checkpoint, and
returns the optimized metric (for sweepers).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from chimeralm_tpu.config import compose
from chimeralm_tpu.utils import (
    RankedLogger,
    extras,
    get_metric_value,
    instantiate,
    instantiate_loggers,
    log_hyperparameters,
    task_wrapper,
)

log = RankedLogger(__name__, rank_zero_only=True)


def _build_mesh(trainer_node: dict):
    import jax

    if trainer_node.get("force_platform"):
        jax.config.update("jax_platforms", trainer_node["force_platform"])
    devices = trainer_node.get("devices")
    axes = tuple(trainer_node.get("mesh_axes") or ("dp",))
    n = len(jax.devices()) if devices in (None, "auto") else min(int(devices), len(jax.devices()))
    if n <= 1 and len(axes) == 1:
        return None
    from chimeralm_tpu.parallel.mesh import make_mesh

    shape = trainer_node.get("mesh_shape")
    return make_mesh(n, axis_names=axes, shape=tuple(shape) if shape else None)


@task_wrapper
def train(cfg: dict) -> tuple[dict, dict]:
    """Train (and optionally test); returns (metric_dict, object_dict)."""
    import numpy as np

    from chimeralm_tpu.runtime.trainer import Trainer

    seed = cfg.get("seed")
    if seed is not None:
        np.random.seed(seed)

    log.info(f"Instantiating datamodule <{cfg['data']['_target_']}>")
    datamodule = instantiate(cfg["data"])

    log.info(f"Instantiating task <{cfg['model']['_target_']}>")
    task = instantiate(cfg["model"])

    loggers = instantiate_loggers(cfg.get("logger"))
    mesh = _build_mesh(cfg.get("trainer", {}))
    trainer_config = instantiate(cfg["trainer"]["config"])

    if mesh is not None and "pp" in mesh.axis_names:
        # pipeline parallelism: the task owns the pp mesh (shard_map GPipe
        # forward); the Trainer sees no mesh — batches stay replicated
        from chimeralm_tpu.parallel.pipeline import PipelineTask

        task = PipelineTask.from_task(
            task, mesh, n_micro=int(cfg["trainer"].get("pp_n_micro", 4))
        )
        mesh = None

    ckpt_dir = None
    cb = cfg.get("callbacks") or {}
    if "model_checkpoint" in cb:
        ckpt_dir = cb["model_checkpoint"].get("dirpath")
        trainer_config.monitor = cb["model_checkpoint"].get("monitor", trainer_config.monitor)
        trainer_config.monitor_mode = cb["model_checkpoint"].get("mode", trainer_config.monitor_mode)
    if "early_stopping" in cb:
        trainer_config.early_stop_patience = cb["early_stopping"].get(
            "patience", trainer_config.early_stop_patience
        )

    trainer = Trainer(task, trainer_config, mesh=mesh, ckpt_dir=ckpt_dir, loggers=loggers)
    object_dict = {"cfg": cfg, "datamodule": datamodule, "task": task, "trainer": trainer}

    if loggers:
        log_hyperparameters(loggers, {"tags": cfg.get("tags"), "seed": seed})

    state = None
    if cfg.get("train", True):
        log.info("Starting training!")
        profiler_cfg = cfg.get("profiler") or {}
        if profiler_cfg.get("enabled"):
            from chimeralm_tpu.utils.profiling import trace

            with trace(profiler_cfg.get("trace_dir", "jax_trace")):
                state = trainer.fit(datamodule, ckpt_path=cfg.get("ckpt_path"))
        else:
            state = trainer.fit(datamodule, ckpt_path=cfg.get("ckpt_path"))

    metric_dict = dict(trainer.callback_metrics)

    if cfg.get("test"):
        log.info("Starting testing!")
        params = state.params if state is not None else None
        if trainer.best_ckpt_path is not None and state is not None:
            state, _ = trainer.load_checkpoint(state, trainer.best_ckpt_path)
            params = state.params
            log.info(f"Best ckpt path: {trainer.best_ckpt_path}")
        if params is not None:
            trainer.test(params, datamodule, model_state=state.model_state if state else None)
    metric_dict.update(trainer.callback_metrics)
    return metric_dict, object_dict


def run_sweep(cfg: dict, overrides: list[str]) -> float:
    """TPE (or random) sweeper over ``cfg['sweep']``.

    Matches the reference's Optuna sweeper surface (reference:
    configs/hparams_search/mambasp_optuna.yaml:17-52 — TPESampler with
    n_startup_trials, direction, n_trials, per-param spaces) with the
    in-framework sampler from ``chimeralm_tpu.runtime.hparam``.
    """
    from chimeralm_tpu.runtime.hparam import make_sampler

    sweep = cfg["sweep"]
    sampler = make_sampler(sweep)
    for trial in range(int(sweep["n_trials"])):
        params = sampler.suggest()
        trial_overrides = list(overrides) + [f"{k}={v}" for k, v in params.items()]
        trial_cfg = compose("train", [o for o in trial_overrides if not o.startswith("hparams_search")])
        log.info(f"sweep trial {trial}: {params}")
        value = None
        try:
            metric_dict, _ = train(trial_cfg)
            value = get_metric_value(metric_dict, sweep.get("metric"))
        except Exception as e:  # failed trials don't kill the sweep
            log.warning(f"trial {trial} failed: {e}")
        sampler.tell(params, value)
    best = sampler.best
    log.info(f"sweep best: {best.value if best else None} params={best.params if best else None}")
    return best.value if best is not None else float("nan")


def _maybe_init_distributed(cfg: dict) -> None:
    """True multi-process data parallelism (reference: configs/trainer/
    ddp.yaml + scripts/run_train.sh 1-task-per-GPU): every process
    contributes its local devices to one global mesh; batches are
    device_put with a global dp sharding so each process only transfers its
    own rows.  Must run before ANY jax call initializes the backend, hence
    the hook at the top of ``main``."""
    node = cfg.get("trainer") or {}
    if not (node.get("coordinator") or node.get("num_processes")):
        return
    import jax

    if node.get("force_platform"):
        jax.config.update("jax_platforms", node["force_platform"])
    from chimeralm_tpu.parallel.dist import initialize

    pi, pc = initialize(
        node.get("coordinator"),
        int(node["num_processes"]) if node.get("num_processes") else None,
        int(node["process_id"]) if node.get("process_id") is not None else None,
    )
    log.info(f"distributed training: process {pi}/{pc}")


def main(argv: list[str] | None = None) -> float | None:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose("train", overrides)
    _maybe_init_distributed(cfg)
    extras(cfg)
    out_dir = (cfg.get("paths") or {}).get("output_dir")
    if out_dir:
        Path(out_dir).mkdir(parents=True, exist_ok=True)
    if cfg.get("sweep"):
        return run_sweep(cfg, overrides)
    metric_dict, _ = train(cfg)
    return get_metric_value(metric_dict, cfg.get("optimized_metric"))


if __name__ == "__main__":
    main()
