"""Train the flagship HyenaDNA classifier on the synthetic WGA-chimera task.

The reference ships a *pretrained* production model (reference:
chimeralm/models/lm.py:12-37 pulls yangliz5/chimeralm, val F1 0.9347 per
scripts/run_eval.sh:30).  Those weights are unreachable here, so this script
produces the equivalent in-framework: a length-curriculum training run
(short -> long context) of ``HyenaDnaClassifier``, optionally seeded by
next-base LM pretraining, ending with a held-out test at the longest context.

TPU-shape discipline: every stage trains at ONE fixed (batch, ctx) shape
(padding="max_length" + drop_last) so the axon relay compiles each step
function exactly once per stage.

Usage:
    python scripts/train_flagship.py --preset pilot      # d64 x 2, ctx<=2048 (CPU-ok)
    python scripts/train_flagship.py --preset flagship   # d256 x 4, ctx<=8192 (TPU)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

logger = logging.getLogger("train_flagship")


@dataclasses.dataclass
class Stage:
    name: str
    ctx: int           # fixed sequence length (tokens) for the whole stage
    min_len: int       # read-length range of the stage's dataset
    max_len: int
    n_reads: int
    batch_size: int
    epochs: int
    lr: float


PRESETS = {
    # CPU-sized recipe used to validate the curriculum end-to-end
    "pilot": dict(
        model=dict(d_model=64, n_layer=2, d_inner=256, max_seq_len=2048, filter_order=32),
        stages=[
            Stage("s1_short", 512, 200, 480, 2000, 32, 30, 1e-3),
            Stage("s2_long", 2048, 300, 1900, 3000, 16, 30, 5e-4),
        ],
        final_ctx=2048,
    ),
    # the real thing: small_32k config at up to 8k context; each stage
    # doubles the read-length range (halving the pooling-dilution jump — a
    # 4x jump stalled in the transfer plateau).  Transfer stages use LOW
    # LRs: the first flagship run showed high-LR transfer (1.5e-4) stalls
    # at chance for 6 epochs while the post-plateau 1.5e-5 phase climbed
    # +0.02 F1/epoch — fine-tune the seed, don't re-train it.
    "flagship": dict(
        model=dict(d_model=256, n_layer=4, d_inner=1024, max_seq_len=32768),
        stages=[
            Stage("s1_short", 512, 200, 480, 6000, 64, 20, 6e-4),
            Stage("s2_mid", 2048, 300, 1900, 8000, 16, 20, 3e-4),
            Stage("s3_4k", 4096, 300, 3800, 8000, 16, 12, 5e-5),
            Stage("s4_long", 8192, 300, 7700, 8000, 8, 15, 3e-5),
        ],
        final_ctx=8192,
    ),
    # context extension to the reference's full 32k: two more doubling
    # stages seeded from the 8k flagship (--start-stage 5 --seed-from
    # demo/flagship/checkpoint.msgpack --head-lr-scale 10); same transfer
    # recipe (low LR, boosted head re-sharpens attention pooling against
    # the 2x/stage dilution)
    "flagship32k": dict(
        model=dict(d_model=256, n_layer=4, d_inner=1024, max_seq_len=32768),
        stages=[
            Stage("s1_short", 512, 200, 480, 6000, 64, 20, 6e-4),
            Stage("s2_mid", 2048, 300, 1900, 8000, 16, 20, 3e-4),
            Stage("s3_4k", 4096, 300, 3800, 8000, 16, 12, 5e-5),
            Stage("s4_long", 8192, 300, 7700, 8000, 8, 15, 3e-5),
            Stage("s5_16k", 16384, 300, 15500, 8000, 4, 10, 2e-5),
            # B=2 measured >=1 s/step through the relay (einsum VJP at
            # n=65536 + per-call dispatch dominate at tiny batch); B=4 keeps
            # 131k tokens/step and halves the step count
            Stage("s6_32k", 32768, 300, 31000, 6000, 4, 4, 1.5e-5),
        ],
        final_ctx=32768,
    ),
}


def make_stage_data(stage: Stage, workdir: Path, seed: int) -> Path:
    import make_synthetic_dataset as synth

    path = workdir / f"{stage.name}_{stage.n_reads}_{stage.min_len}_{stage.max_len}_{seed}.parquet"
    if not path.exists():
        synth.generate(stage.n_reads, path, seed=seed, min_len=stage.min_len, max_len=stage.max_len)
    return path


def build_datamodule(tok, path: Path, stage: Stage):
    from chimeralm_tpu.data.collator import DataCollator
    from chimeralm_tpu.data.datamodule import ParquetDataModule

    dm = ParquetDataModule(
        tok,
        train_data_path=path,
        batch_size=stage.batch_size,
        train_val_test_split=(0.8, 0.1, 0.1),
    )
    # fixed-shape batches: one compiled (B, ctx) step per stage
    dm.collator = DataCollator(tok, padding="max_length", max_length=stage.ctx)
    return dm


def make_stage_seed(trainer, task, stage_ctx: int, prev_ckpt: Path, seed: int, backbone=None) -> Path:
    """Write a params-only seed checkpoint for the next stage.

    Carries params (+model_state) from ``prev_ckpt`` (or a pretrained
    backbone) into a FRESH optimizer state — restoring the previous stage's
    Adam moments across a read-length distribution shift destabilized
    training in the round-2 pilots; a fresh opt_state re-enables warmup.
    """
    import jax
    import jax.numpy as jnp

    state = task.init_state(jax.random.PRNGKey(seed), jnp.zeros((1, stage_ctx), jnp.int32))
    if prev_ckpt is not None:
        prev, _ = trainer.load_checkpoint(state, prev_ckpt)
        state = state.replace(params=prev.params, model_state=prev.model_state)
    elif backbone is not None:
        from chimeralm_tpu.runtime.pretrain import seed_classifier_params

        state = state.replace(params=seed_classifier_params(dict(state.params), backbone))
    trainer.ckpt_dir.mkdir(parents=True, exist_ok=True)
    trainer.save_checkpoint(state, "stage_seed", {"epoch": -1})
    return trainer.ckpt_dir / "stage_seed.ckpt.msgpack"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=sorted(PRESETS), default="flagship")
    p.add_argument("--workdir", default=str(REPO / "demo" / "flagship_run"))
    p.add_argument("--out", default=str(REPO / "demo" / "flagship"))
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--fft-method", default="auto", choices=["auto", "xla", "matmul", "pallas"])
    p.add_argument("--pretrain-steps", type=int, default=0,
                   help="next-base LM pretraining steps before stage 1 (0 = off)")
    p.add_argument("--pretrain-lr", type=float, default=6e-4)
    p.add_argument("--filter-lr-scale", type=float, default=1.0)
    p.add_argument("--head-lr-scale", type=float, default=1.0,
                   help="classifier-head LR multiplier; >1 lets attention pooling "
                        "re-sharpen during context transfer without destroying the backbone")
    p.add_argument("--warmup-steps", type=int, default=200)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--clip-norm", type=float, default=1.0,
                   help="global-norm gradient clip (spikes destabilize long-context Hyena)")
    p.add_argument("--platform", default=None, help="force jax platform (cpu for pilots)")
    p.add_argument("--max-stage", type=int, default=None, help="stop after stage N (1-based)")
    p.add_argument("--start-stage", type=int, default=1,
                   help="skip stages before N (1-based); use with --seed-from")
    p.add_argument("--seed-from", default=None,
                   help="checkpoint whose params seed the first executed stage; "
                        "a Trainer ckpt DIRECTORY resolves to its best.json pick")
    p.add_argument("--stage-epochs", type=int, default=None, help="override epochs for every stage")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s", datefmt="%H:%M:%S")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.models.hyena import HyenaConfig, HyenaDnaClassifier
    from chimeralm_tpu.runtime.optim import make_adamw_grouped
    from chimeralm_tpu.runtime.task import ClassificationTask
    from chimeralm_tpu.runtime.trainer import CsvLogger, Trainer, TrainerConfig

    preset = PRESETS[args.preset]
    stages: list[Stage] = preset["stages"]
    if args.max_stage:
        stages = stages[: args.max_stage]
    if args.start_stage > 1:
        stages = stages[args.start_stage - 1:]
    if args.stage_epochs:
        stages = [dataclasses.replace(s, epochs=args.stage_epochs) for s in stages]

    workdir = Path(args.workdir); workdir.mkdir(parents=True, exist_ok=True)
    out_dir = Path(args.out); out_dir.mkdir(parents=True, exist_ok=True)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = HyenaConfig(**preset["model"], dtype=dtype, fft_method=args.fft_method)
    model = HyenaDnaClassifier(config=cfg)
    # RIGHT padding: with causal convs, read positions never see pads, so
    # fixed-shape training is padding-invariant (matches the fast predict
    # path); heavy LEFT padding was the round-2 pilot's stall culprit
    tok = CharacterTokenizer(model_max_length=preset["final_ctx"] + 2, padding_side="right")

    logger.info("platform=%s devices=%s preset=%s", jax.default_backend(), jax.devices(), args.preset)

    # -- optional pretraining ------------------------------------------------
    pretrained_backbone = None
    if args.pretrain_steps > 0:
        from chimeralm_tpu.runtime.pretrain import PretrainTask

        pt_stage = stages[min(1, len(stages) - 1)]
        pt_path = make_stage_data(pt_stage, workdir, args.seed + 100)
        dm = build_datamodule(tok, pt_path, pt_stage)
        dm.setup("fit")
        pt = PretrainTask(cfg, learning_rate=args.pretrain_lr, warmup_steps=args.warmup_steps)
        pstep = pt.jit_train_step()
        rng = jax.random.PRNGKey(args.seed)
        pstate = pt.init_state(rng, jnp.zeros((1, pt_stage.ctx), jnp.int32))
        t0 = time.time()
        done, epoch = 0, 0
        while done < args.pretrain_steps:
            for batch in dm.train_batches(epoch, args.seed, drop_last=True):
                pstate, ploss = pstep(pstate, jnp.asarray(batch["input_ids"]), rng)
                done += 1
                if done % 50 == 0:
                    logger.info("pretrain %d/%d loss=%.4f (%.0fs)", done, args.pretrain_steps,
                                float(ploss), time.time() - t0)
                if done >= args.pretrain_steps:
                    break
            epoch += 1
        pretrained_backbone = pt.export_backbone(pstate)
        logger.info("pretraining done; backbone exported")

    # -- curriculum ----------------------------------------------------------
    prev_best: Path | None = None
    if args.seed_from:
        prev_best = Path(args.seed_from)
        if prev_best.is_dir():
            best_file = prev_best / "best.json"
            if best_file.exists():
                prev_best = Path(json.loads(best_file.read_text())["path"])
            elif (prev_best / "last.ckpt.msgpack").exists():
                prev_best = prev_best / "last.ckpt.msgpack"
            elif (prev_best / "checkpoint.msgpack").exists():
                # from_pretrained export carrying a full trainer checkpoint
                prev_best = prev_best / "checkpoint.msgpack"
            elif (prev_best / "flax_params.msgpack").exists():
                # params-only from_pretrained export (the r3+ demo format)
                prev_best = prev_best / "flax_params.msgpack"
            else:
                prev_best = prev_best / "last.ckpt.msgpack"
            logger.info("seed-from directory resolved to %s", prev_best)
    results = {}
    last_trainer = None
    last_dm = None
    ckpt_path = None
    for i, stage in enumerate(stages):
        data_path = make_stage_data(stage, workdir, args.seed + i)
        dm = build_datamodule(tok, data_path, stage)
        task = ClassificationTask(
            model,
            optimizer=make_adamw_grouped(
                stage.lr, args.weight_decay, warmup_steps=args.warmup_steps,
                filter_lr_scale=args.filter_lr_scale, head_lr_scale=args.head_lr_scale,
                clip_norm=args.clip_norm,
            ),
        )
        ckpt_dir = workdir / f"ckpt_{stage.name}"
        trainer = Trainer(
            task,
            TrainerConfig(
                max_epochs=stage.epochs, early_stop_patience=max(8, stage.epochs // 2),
                # generous: a premature 10x LR cut during the stage-transfer
                # plateau locks the stall (observed on the first flagship run)
                plateau_patience=max(6, stage.epochs // 2),
                seed=args.seed, learning_rate=stage.lr,
                drop_last=True,
            ),
            ckpt_dir=ckpt_dir,
            loggers=[CsvLogger(workdir / f"metrics_{stage.name}.csv")],
        )

        # params-only seed: previous stage's best weights (or the pretrained
        # backbone), FRESH optimizer state + warmup
        if prev_best is not None or pretrained_backbone is not None:
            ckpt_path = make_stage_seed(
                trainer, task, stage.ctx, prev_best, args.seed,
                backbone=None if prev_best is not None else pretrained_backbone,
            )

        logger.info("=== stage %s: ctx=%d reads %d-%d batch=%d lr=%g epochs=%d",
                    stage.name, stage.ctx, stage.min_len, stage.max_len,
                    stage.batch_size, stage.lr, stage.epochs)
        t0 = time.time()
        trainer.fit(dm, ckpt_path=ckpt_path)
        results[stage.name] = {
            "val_f1": trainer.callback_metrics.get("val/f1"),
            "val_f1_best": trainer.callback_metrics.get("val/f1_best"),
            "seconds": round(time.time() - t0, 1),
        }
        logger.info("stage %s done: %s", stage.name, results[stage.name])
        prev_best = trainer.best_ckpt_path or (ckpt_dir / "last.ckpt.msgpack")
        ckpt_path = prev_best
        last_trainer, last_dm = trainer, dm

    # -- held-out test at the final context ----------------------------------
    final_stage = stages[-1]
    state = last_trainer.task.init_state(
        jax.random.PRNGKey(0), jnp.zeros((1, final_stage.ctx), jnp.int32)
    )
    state, _ = last_trainer.load_checkpoint(state, ckpt_path)
    test_metrics = last_trainer.test(state.params, last_dm, model_state=state.model_state)
    results["test"] = {k: float(v) for k, v in test_metrics.items()}

    # -- export --------------------------------------------------------------
    # params-only artifact (the full TrainState ckpt carries Adam moments --
    # 3x the size); plus a from_pretrained-compatible dir so
    # `chimeralm predict --ckpt demo/flagship` works directly
    import flax.serialization
    import numpy as np

    from chimeralm_tpu.models.lm import LoadedModel, save_pretrained

    params_np = jax.tree.map(np.asarray, state.params)
    (out_dir / "checkpoint.msgpack").write_bytes(
        flax.serialization.msgpack_serialize(
            flax.serialization.to_state_dict({"params": params_np, "step": int(state.step)})
        )
    )
    save_pretrained(LoadedModel(model, params_np, cfg), out_dir)
    meta = {
        "preset": args.preset,
        "model": preset["model"],
        "dtype": args.dtype,
        "final_ctx": preset["final_ctx"],
        "stages": [dataclasses.asdict(s) for s in stages],
        "pretrain_steps": args.pretrain_steps,
        "filter_lr_scale": args.filter_lr_scale,
        "seed": args.seed,
        "results": results,
    }
    (out_dir / "meta.json").write_text(json.dumps(meta, indent=2))
    logger.info("exported to %s; results: %s", out_dir, json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
