"""Training/eval driver: epochs, checkpointing, early stopping, logging.

Replaces the Lightning ``Trainer`` orchestration used by the reference
(reference: train.py:37-106, eval.py:33-85, configs/callbacks/default.yaml):

* per-epoch train/val loops over jitted task steps, streaming F1/loss;
* ``ModelCheckpoint`` semantics: monitor ``val/f1`` (max), filename
  ``epoch_{epoch:03d}_f1_{val/f1:.4f}``, ``last`` always saved, resume from
  a checkpoint directory restores params/opt-state/epoch/scheduler state;
* ``EarlyStopping(monitor=val/f1, patience=40, mode=max)``;
* ``ReduceLROnPlateau(monitor=val/loss, factor=0.1, patience=10)`` stepped
  per epoch into the injected optimizer hyperparams;
* metric log lines go to console + CSV (+ any extra logger objects).

Mesh-parallel: pass ``mesh`` and the trainer shards params by the tp rules
and every batch over dp; metric reduction happens inside jit (psum).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from chimeralm_tpu.runtime.optim import EarlyStopping, ReduceLROnPlateau, set_learning_rate
from chimeralm_tpu.runtime.task import ClassificationTask, TrainState

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 100
    min_epochs: int = 1
    seed: int = 42
    monitor: str = "val/f1"
    monitor_mode: str = "max"
    early_stop_patience: int = 40
    plateau_patience: int = 10
    plateau_factor: float = 0.1
    learning_rate: float = 1e-4
    log_every_n_steps: int = 50
    limit_train_batches: int | None = None
    limit_val_batches: int | None = None
    limit_test_batches: int | None = None
    fast_dev_run: bool = False
    overfit_batches: int = 0
    drop_last: bool = True
    save_top_k: int = 1
    # "msgpack" (single-file flax serialization) or "orbax" (sharding-aware
    # directory checkpoints -- the TPU-native store, SURVEY §5)
    checkpoint_format: str = "msgpack"


class CsvLogger:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._keys: list[str] | None = None

    def log_metrics(self, metrics: dict, step: int | None = None):
        row = dict(metrics)
        if step is not None:
            row["step"] = step
        if self._keys is None:
            self._keys = sorted(row)
            with self.path.open("w") as f:
                f.write(",".join(self._keys) + "\n")
        with self.path.open("a") as f:
            f.write(",".join(str(row.get(k, "")) for k in self._keys) + "\n")


class Trainer:
    def __init__(
        self,
        task: ClassificationTask,
        config: TrainerConfig | None = None,
        mesh=None,
        ckpt_dir: str | Path | None = None,
        loggers: list | None = None,
    ):
        self.task = task
        self.config = config or TrainerConfig()
        self.mesh = mesh
        self.ckpt_dir = Path(ckpt_dir) if ckpt_dir else None
        self.loggers = loggers or []
        self.callback_metrics: dict[str, float] = {}
        # accumulating steps: metrics merge inside jit (one device call per
        # batch, no eager per-batch ops or fetches — relay-friendly)
        self._train_step, self._eval_step = task.jit_steps_acc()
        self.best_ckpt_path: Path | None = None

    # -- batch placement ---------------------------------------------------
    def _place(self, batch: dict) -> dict:
        arrays = {k: v for k, v in batch.items() if k != "id"}
        if "input_ids" in arrays and "attention_mask" not in arrays:
            # mask derivable from PAD id; the task forwards it when present
            arrays["attention_mask"] = (arrays["input_ids"] != 4).astype(np.int32)
        if self.mesh is not None:
            from chimeralm_tpu.parallel.mesh import pad_batch_to_multiple, shard_batch

            n_dp = int(np.prod(self.mesh.devices.shape[:1]))
            extra = pad_batch_to_multiple(arrays["input_ids"].shape[0], n_dp)
            if extra:
                # pad rows with PAD tokens and ignore-labels: excluded from
                # loss (valid mask) and from metric counts (IGNORE_INDEX)
                def pad(k, v):
                    widths = [(0, extra)] + [(0, 0)] * (v.ndim - 1)
                    fill = {"input_ids": 4, "labels": -100, "attention_mask": 0}.get(k, 0)
                    return np.pad(v, widths, constant_values=fill)

                arrays = {k: pad(k, np.asarray(v)) for k, v in arrays.items()}
            arrays = shard_batch(arrays, self.mesh)
        return arrays

    def _log(self, metrics: dict, step: int):
        self.callback_metrics.update(metrics)
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    # -- checkpointing -----------------------------------------------------
    def save_checkpoint(self, state: TrainState, tag: str, extra: dict | None = None) -> Path | None:
        if self.ckpt_dir is None:
            return None
        if jax.process_count() > 1 and jax.process_index() != 0 and self.config.checkpoint_format != "orbax":
            # multi-process run, host-local format: params are replicated, so
            # rank 0's file is the checkpoint (matches the reference's
            # rank-zero ModelCheckpoint); orbax instead writes collectively,
            # each process contributing its addressable shards
            return None
        import flax.serialization

        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        if self.config.checkpoint_format == "orbax":
            # sharding-aware: leaves stay jax.Arrays (possibly sharded over
            # the mesh) — orbax writes each device's shards without a host
            # gather, the distributed-checkpoint path of SURVEY §5
            import orbax.checkpoint as ocp

            payload = {
                "params": state.params,
                "opt_state": state.opt_state,
                "model_state": state.model_state,
                "step": int(state.step),
            }
            path = (self.ckpt_dir / f"{tag}.ckpt.orbax").resolve()
            if path.exists():
                import shutil

                shutil.rmtree(path)
            ocp.PyTreeCheckpointer().save(
                path, flax.serialization.to_state_dict(payload)
            )
        else:
            payload = {
                "params": jax.tree.map(np.asarray, state.params),
                "opt_state": jax.tree.map(
                    lambda x: np.asarray(x) if isinstance(x, (jnp.ndarray, np.ndarray)) else x,
                    state.opt_state,
                ),
                "model_state": jax.tree.map(np.asarray, state.model_state),
                "step": int(state.step),
            }
            path = self.ckpt_dir / f"{tag}.ckpt.msgpack"
            path.write_bytes(flax.serialization.msgpack_serialize(
                flax.serialization.to_state_dict(payload)
            ))
        if extra is not None:
            (self.ckpt_dir / f"{tag}.meta.json").write_text(json.dumps(extra))
        return path

    def load_checkpoint(self, state: TrainState, path: str | Path) -> tuple[TrainState, dict]:
        import flax.serialization

        path = Path(path)
        payload = {
            "params": jax.tree.map(np.asarray, state.params),
            "opt_state": state.opt_state,
            "model_state": jax.tree.map(np.asarray, state.model_state),
            "step": int(state.step),
        }
        target = flax.serialization.to_state_dict(payload)
        if path.suffix == ".orbax" or path.is_dir():
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            try:
                # sharding-aware restore: leaves land directly on the target
                # state's shardings (per-device shard reads, no host gather)
                sharded_target = flax.serialization.to_state_dict({
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "model_state": state.model_state,
                    "step": int(state.step),
                })
                restore_args = ocp.checkpoint_utils.construct_restore_args(sharded_target)
                raw = ckptr.restore(
                    str(path.resolve()), item=sharded_target, restore_args=restore_args
                )
            except Exception:
                # structure mismatch (params-only export, optimizer recipe
                # change): raw host restore + the tolerance logic below
                raw = ckptr.restore(str(path.resolve()))
        else:
            raw = flax.serialization.msgpack_restore(path.read_bytes())
        if "params" not in raw:
            # bare params tree (a from_pretrained ``flax_params.msgpack``
            # export): wrap it into TrainState shape
            raw = {"params": raw}
        # params-only exports (scripts/train_flagship.py) omit opt_state etc.
        for key in ("opt_state", "model_state", "step"):
            if key not in raw:
                raw[key] = target[key]
        try:
            opt_state = flax.serialization.from_state_dict(state.opt_state, raw["opt_state"])
        except (ValueError, KeyError, TypeError):
            # optimizer recipe changed between save and load (e.g. new param
            # groups): keep the fresh opt_state, restore params only
            logger.warning(
                "checkpoint %s opt_state does not match the current optimizer; "
                "restoring params with a fresh optimizer state", path.name
            )
            opt_state = state.opt_state
            raw["opt_state"] = target["opt_state"]
        restored = flax.serialization.from_state_dict(target, raw)
        new_state = TrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=jax.tree.map(jnp.asarray, restored["params"]),
            opt_state=opt_state,
            model_state=jax.tree.map(jnp.asarray, restored.get("model_state", {})),
        )
        meta_path = path.with_suffix("").with_suffix(".meta.json")
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        return new_state, meta

    # -- loops -------------------------------------------------------------
    def _run_eval(self, params, batches, limit: int | None, prefix: str, extra_metrics: bool = False, model_state=None) -> dict:
        acc = self.task.zero_acc()
        for i, batch in enumerate(batches):
            if limit is not None and i >= limit:
                break
            acc = self._eval_step(params, self._place(batch), model_state, acc)
        counts, loss = acc["counts"], acc["loss"]
        metrics = {
            f"{prefix}/loss": float(loss.compute()),
            f"{prefix}/f1": float(counts.f1()),
        }
        if extra_metrics:
            metrics[f"{prefix}/precision"] = float(counts.precision())
            metrics[f"{prefix}/recall"] = float(counts.recall())
        return metrics

    def fit(self, datamodule, ckpt_path: str | Path | None = None) -> TrainState:
        cfg = self.config
        datamodule.setup("fit")
        rng = jax.random.PRNGKey(cfg.seed)
        init_rng, dropout_rng = jax.random.split(rng)

        first = next(iter(datamodule.train_batches(0, cfg.seed)))
        example = jnp.asarray(first["input_ids"][:1])
        if self.mesh is not None:
            state = self.task.sharded_state(init_rng, example, self.mesh)
        else:
            state = self.task.init_state(init_rng, example)

        scheduler = ReduceLROnPlateau(
            lr=cfg.learning_rate, patience=cfg.plateau_patience, factor=cfg.plateau_factor
        )
        stopper = EarlyStopping(patience=cfg.early_stop_patience, mode=cfg.monitor_mode)
        start_epoch = 0
        best_metric = None

        if ckpt_path is not None:
            state, meta = self.load_checkpoint(state, ckpt_path)
            start_epoch = meta.get("epoch", -1) + 1
            if "scheduler" in meta:
                scheduler.__dict__.update(meta["scheduler"])
            if "stopper" in meta:
                stopper.__dict__.update(meta["stopper"])
            best_metric = meta.get("best_metric")
            logger.info("resumed from %s at epoch %d", ckpt_path, start_epoch)

        max_epochs = 1 if cfg.fast_dev_run else cfg.max_epochs
        limit_train = 1 if cfg.fast_dev_run else cfg.limit_train_batches
        limit_val = 1 if cfg.fast_dev_run else cfg.limit_val_batches
        val_f1_best = -np.inf

        overfit_cache = None
        for epoch in range(start_epoch, max_epochs):
            t0 = time.perf_counter()
            acc = self.task.zero_acc()
            if cfg.overfit_batches:
                if overfit_cache is None:
                    it = datamodule.train_batches(0, cfg.seed, drop_last=cfg.drop_last)
                    overfit_cache = [b for _, b in zip(range(cfg.overfit_batches), it)]
                batches = iter(overfit_cache)
            else:
                batches = datamodule.train_batches(epoch, cfg.seed, drop_last=cfg.drop_last)
            n_batches = 0
            for i, batch in enumerate(batches):
                if limit_train is not None and i >= limit_train:
                    break
                state, acc = self._train_step(state, self._place(batch), dropout_rng, acc)
                n_batches += 1
            train_metrics = {
                "train/loss": float(acc["loss"].compute()),
                "train/f1": float(acc["counts"].f1()),
                "epoch": epoch,
                "lr": scheduler.lr,
            }

            val_metrics = self._run_eval(
                state.params, datamodule.val_batches(), limit_val, "val", model_state=state.model_state
            )
            val_f1_best = max(val_f1_best, val_metrics["val/f1"])
            val_metrics["val/f1_best"] = val_f1_best

            metrics = {**train_metrics, **val_metrics}
            metrics["epoch_time_s"] = round(time.perf_counter() - t0, 2)
            self._log(metrics, int(state.step))
            logger.info(
                "epoch %d: train/loss=%.4f train/f1=%.4f val/loss=%.4f val/f1=%.4f (%d batches, %.1fs)",
                epoch, metrics["train/loss"], metrics["train/f1"],
                metrics["val/loss"], metrics["val/f1"], n_batches, metrics["epoch_time_s"],
            )

            # scheduler on val/loss (reference: lm.py:34, monitor val/loss)
            new_lr = scheduler.step(val_metrics["val/loss"])
            state = state.replace(opt_state=set_learning_rate(state.opt_state, new_lr))

            monitored = metrics[cfg.monitor]
            improved = best_metric is None or (
                monitored > best_metric if cfg.monitor_mode == "max" else monitored < best_metric
            )
            extra = {
                "epoch": epoch,
                "metrics": metrics,
                "scheduler": {k: scheduler.__dict__[k] for k in ("lr", "best", "num_bad_epochs")},
                "stopper": {k: stopper.__dict__[k] for k in ("best", "wait", "stopped")},
                "best_metric": best_metric if not improved else monitored,
            }
            self.save_checkpoint(state, "last", extra)
            if improved:
                best_metric = monitored
                tag = f"epoch_{epoch:03d}_f1_{val_metrics['val/f1']:.4f}"
                self.best_ckpt_path = self.save_checkpoint(state, tag, extra)
                if self.best_ckpt_path is not None:
                    (self.ckpt_dir / "best.json").write_text(
                        json.dumps({"path": str(self.best_ckpt_path), cfg.monitor: monitored})
                    )

            if epoch + 1 >= cfg.min_epochs and stopper.step(monitored):
                logger.info("early stopping at epoch %d (best %s=%.4f)", epoch, cfg.monitor, stopper.best)
                break

        return state

    def test(self, params, datamodule, model_state=None) -> dict:
        datamodule.setup("test")
        metrics = self._run_eval(
            params, datamodule.test_batches(), self.config.limit_test_batches, "test",
            extra_metrics=True, model_state=model_state,
        )
        self._log(metrics, -1)
        logger.info("test: %s", metrics)
        return metrics

    def validate(self, params, datamodule, model_state=None) -> dict:
        datamodule.setup("validate")
        metrics = self._run_eval(params, datamodule.val_batches(), None, "val", model_state=model_state)
        self._log(metrics, -1)
        return metrics
