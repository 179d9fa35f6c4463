"""Rank-aware logging + pluggable metric loggers.

Replaces the reference's RankedLogger (reference: chimeralm/utils/pylogger.py)
and the Lightning logger zoo (configs/logger/*.yaml): console logging is
prefixed with the process index and can be restricted to process 0; metric
sinks include CSV (always available), TensorBoard and wandb (gated on their
packages being installed).
"""

from __future__ import annotations

import logging
import os


def process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("CHIMERALM_RANK", 0))


class RankedLogger(logging.LoggerAdapter):
    """Rank-prefixed logger; optionally rank-zero only."""

    def __init__(self, name: str = __name__, rank_zero_only: bool = False, extra=None):
        super().__init__(logging.getLogger(name), extra or {})
        self.rank_zero_only = rank_zero_only

    def log(self, level: int, msg: str, *args, rank: int | None = None, **kwargs):
        if not self.isEnabledFor(level):
            return
        current = process_index()
        msg = f"[rank: {current}] {msg}"
        if self.rank_zero_only and current != 0:
            return
        if rank is not None and current != rank:
            return
        self.logger.log(level, msg, *args, **kwargs)


class TensorBoardLogger:
    """Metric sink writing TF event files (torch SummaryWriter backend)."""

    def __init__(self, save_dir: str, name: str = "chimeralm"):
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(log_dir=os.path.join(save_dir, name))

    def log_metrics(self, metrics: dict, step: int | None = None):
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self._writer.add_scalar(k, v, global_step=step or 0)

    def log_hyperparams(self, params: dict):
        self._writer.add_text("hparams", str(params))


class WandbLogger:
    """wandb sink; raises ImportError when wandb isn't installed."""

    def __init__(self, project: str = "chimeralm", name: str | None = None, save_dir: str = "logs/", **kw):
        import wandb

        self._run = wandb.init(project=project, name=name, dir=save_dir, **kw)
        self._wandb = wandb

    def log_metrics(self, metrics: dict, step: int | None = None):
        self._wandb.log(metrics, step=step)

    def log_hyperparams(self, params: dict):
        self._run.config.update(params, allow_val_change=True)

    def finalize(self):
        self._wandb.finish()


def log_hyperparameters(loggers: list, cfg: dict, param_count: int | None = None) -> None:
    """Broadcast config + parameter counts to all metric sinks.

    Reference: chimeralm/utils/logging_utils.py:11-53.
    """
    payload = dict(cfg)
    if param_count is not None:
        payload["model/params/total"] = param_count
    for lg in loggers:
        if hasattr(lg, "log_hyperparams"):
            lg.log_hyperparams(payload)


class _ThirdPartyLogger:
    """Base for optional sinks: importing the backend may raise ImportError,
    which ``instantiate_loggers`` treats as 'skip this sink'."""


class MLFlowLogger(_ThirdPartyLogger):
    def __init__(self, experiment_name: str = "chimeralm", tracking_uri: str | None = None, **kw):
        import mlflow

        self._mlflow = mlflow
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        mlflow.set_experiment(experiment_name)
        mlflow.start_run()

    def log_metrics(self, metrics: dict, step: int | None = None):
        self._mlflow.log_metrics(
            {k.replace("/", "_"): v for k, v in metrics.items() if isinstance(v, (int, float))},
            step=step,
        )

    def log_hyperparams(self, params: dict):
        self._mlflow.log_params({k: str(v) for k, v in params.items()})


class NeptuneLogger(_ThirdPartyLogger):
    def __init__(self, project: str = "chimeralm", **kw):
        import neptune

        self._run = neptune.init_run(project=project, **kw)

    def log_metrics(self, metrics: dict, step: int | None = None):
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self._run[k].append(v, step=step)

    def log_hyperparams(self, params: dict):
        self._run["parameters"] = {k: str(v) for k, v in params.items()}


class CometLogger(_ThirdPartyLogger):
    def __init__(self, project_name: str = "chimeralm", **kw):
        import comet_ml

        self._exp = comet_ml.Experiment(project_name=project_name, **kw)

    def log_metrics(self, metrics: dict, step: int | None = None):
        self._exp.log_metrics(
            {k: v for k, v in metrics.items() if isinstance(v, (int, float))}, step=step
        )

    def log_hyperparams(self, params: dict):
        self._exp.log_parameters(params)


class AimLogger(_ThirdPartyLogger):
    def __init__(self, experiment: str = "chimeralm", repo: str | None = None, **kw):
        import aim

        self._run = aim.Run(experiment=experiment, repo=repo)

    def log_metrics(self, metrics: dict, step: int | None = None):
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self._run.track(v, name=k, step=step)

    def log_hyperparams(self, params: dict):
        self._run["hparams"] = {k: str(v) for k, v in params.items()}
