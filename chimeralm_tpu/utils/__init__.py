"""Utilities: logging, instantiation, config printing, task wrapping, profiling."""

import logging
import warnings
from pathlib import Path

from chimeralm_tpu.utils.instantiate import instantiate, locate  # noqa: F401
from chimeralm_tpu.utils.loggers import (  # noqa: F401
    RankedLogger,
    TensorBoardLogger,
    WandbLogger,
    log_hyperparameters,
)
from chimeralm_tpu.utils.rich_utils import enforce_tags, print_config_tree  # noqa: F401

log = logging.getLogger(__name__)


def extras(cfg: dict) -> None:
    """Pre-task hook: warnings filter, tag enforcement, config tree printing.

    Reference: chimeralm/utils/utils.py:13-41.
    """
    ex = cfg.get("extras") or {}
    if ex.get("ignore_warnings"):
        warnings.filterwarnings("ignore")
    if ex.get("enforce_tags"):
        enforce_tags(cfg)
    if ex.get("print_config"):
        print_config_tree(cfg)


def task_wrapper(task_func):
    """Log exceptions to file and always close wandb, so multiruns survive a
    failed trial (reference: chimeralm/utils/utils.py:44-96)."""

    def wrap(cfg: dict):
        try:
            return task_func(cfg)
        except Exception:
            out_dir = (cfg.get("paths") or {}).get("output_dir")
            if out_dir:
                Path(out_dir).mkdir(parents=True, exist_ok=True)
                import traceback

                (Path(out_dir) / "exec_time.log").write_text(traceback.format_exc())
            raise
        finally:
            try:
                import wandb

                if wandb.run:
                    wandb.finish()
            except Exception:
                pass

    return wrap


def get_metric_value(metric_dict: dict, metric_name: str | None) -> float | None:
    """Fetch the optimized metric for sweepers (reference: utils.py:99-121)."""
    if not metric_name:
        return None
    if metric_name not in metric_dict:
        raise KeyError(
            f"Metric value not found! {metric_name=} not in {sorted(metric_dict)}"
        )
    value = metric_dict[metric_name]
    return float(value)


def instantiate_callbacks(cfg_node) -> list:
    """Instantiate a dict of callback configs (reference: instantiators.py:11-32)."""
    out = []
    if not cfg_node:
        return out
    for _name, node in cfg_node.items():
        if isinstance(node, dict) and "_target_" in node:
            out.append(instantiate(node))
    return out


def instantiate_loggers(cfg_node) -> list:
    """Instantiate metric sinks, skipping ones whose package is missing
    (reference: instantiators.py:35-54)."""
    out = []
    if not cfg_node:
        return out
    for name, node in cfg_node.items():
        if isinstance(node, dict) and "_target_" in node:
            try:
                out.append(instantiate(node))
            except ImportError as e:
                log.warning("logger %s unavailable (%s) — skipped", name, e)
    return out
