"""Hydra-style evaluation/prediction entry point (reference parity: eval.py).

Usage:

    python eval.py ckpt_path=... data.test_data_path=...
    python eval.py ckpt_path=... data.predict_data_path=...   # batch predict

Branching matches the reference (eval.py:74-82): with
``data.predict_data_path`` unset it runs the test loop on the checkpoint;
otherwise it runs prediction with the PredictionWriter callback.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

from chimeralm_tpu.config import compose
from chimeralm_tpu.utils import (
    RankedLogger,
    extras,
    instantiate,
    instantiate_callbacks,
    instantiate_loggers,
    task_wrapper,
)

log = RankedLogger(__name__, rank_zero_only=True)


@task_wrapper
def evaluate(cfg: dict) -> tuple[dict, dict]:
    import jax

    # trainer=cpu honors force_platform here like train.py's mesh builder
    # (the image's sitecustomize force-selects the TPU platform otherwise)
    force_platform = (cfg.get("trainer") or {}).get("force_platform")
    if force_platform:
        jax.config.update("jax_platforms", force_platform)

    import jax.numpy as jnp

    from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine
    from chimeralm_tpu.runtime.trainer import Trainer

    assert cfg.get("ckpt_path"), "ckpt_path is required for eval"

    log.info(f"Instantiating datamodule <{cfg['data']['_target_']}>")
    datamodule = instantiate(cfg["data"])
    log.info(f"Instantiating task <{cfg['model']['_target_']}>")
    task = instantiate(cfg["model"])
    loggers = instantiate_loggers(cfg.get("logger"))
    callbacks = instantiate_callbacks(cfg.get("callbacks"))
    trainer_config = instantiate(cfg["trainer"]["config"])
    trainer = Trainer(task, trainer_config, loggers=loggers)

    # restore params from a trainer checkpoint (msgpack) or a converted ckpt
    ckpt_path = Path(cfg["ckpt_path"])
    example = jnp.zeros((1, 64), jnp.int32)
    state = task.init_state(jax.random.PRNGKey(0), example)
    if ckpt_path.suffix == ".msgpack" or ckpt_path.name.endswith(".ckpt.msgpack"):
        state, _ = trainer.load_checkpoint(state, ckpt_path)
        params = state.params
    else:
        from chimeralm_tpu.models.lm import ChimeraLM

        params = ChimeraLM.from_pretrained(ckpt_path).params

    predict_path = cfg["data"].get("predict_data_path")
    if not predict_path:
        log.info("Starting testing!")
        metrics = trainer.test(params, datamodule)
        return dict(metrics), {"cfg": cfg, "trainer": trainer}

    log.info("Starting prediction!")
    writers = callbacks or None
    engine = PredictEngine(
        task.model,
        params,
        datamodule.tokenizer,
        PredictConfig(batch_size=cfg["data"].get("batch_size", 12), mode=cfg.get("predict_mode", "parity")),
    )
    datamodule.setup("predict")
    out_dir = (cfg.get("paths") or {}).get("output_dir", "predictions")
    stats = engine.predict(datamodule.predict_reads(), writers=writers, output_dir=None if writers else out_dir)
    log.info(f"predicted {stats.n_reads} reads at {stats.reads_per_s:.1f} reads/s")
    return {"n_reads": stats.n_reads}, {"cfg": cfg}


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose("eval", overrides)
    extras(cfg)
    evaluate(cfg)


if __name__ == "__main__":
    main()
