"""Train the secondary backbones on the synthetic WGA-chimera task.

The reference publishes one quality number per backbone family, all trained
on its (cluster-private) real WGA data: CNN 0.8763 / Hyena 0.8708 /
Transformer 0.8705 (reference: scripts/runforp2.sh:5-14) and the production
Mamba 0.9347 (reference: scripts/run_eval.sh:30).  This driver produces the
equivalent in-framework table on the synthetic junction-adapter task: one
fixed-shape training run per backbone through the SAME config-composed
model nodes that `train.py experiment={cnn,transformer,mamba}` uses, a
held-out test, and a per-backbone export under ``demo/zoo/``.

Training uses right padding + attention masks (the round-2 diagnosis:
left-pad prefixes stall causal architectures — hyena then, the Mamba scan
equally; the reference's own numbers come from its real data and are not
directly comparable either way, see docs/parity.md).

Usage:
    python scripts/train_zoo.py                       # all three, TPU
    python scripts/train_zoo.py --models cnn --epochs 2 --platform cpu
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

logger = logging.getLogger("train_zoo")

ZOO = ("cnn", "transformer", "mamba", "hyena")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+", default=list(ZOO), choices=ZOO)
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--min-len", type=int, default=300)
    p.add_argument("--max-len", type=int, default=1900)
    p.add_argument("--reads", type=int, default=6000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=None, help="override the config LR")
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--patience", type=int, default=None,
                   help="early-stop patience (default: epochs//2; plateau-then-"
                        "crack dynamics need it >= the full budget)")
    p.add_argument("--head-lr-scale", type=float, default=1.0,
                   help="classifier-head LR multiplier (the flagship's boosted-"
                        "head recipe: attention-pooling gradients dilute ~1/L)")
    p.add_argument("--dropout", type=float, default=None,
                   help="override the model config's dropout rate")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mode", default="easy", choices=["easy", "hard"],
                   help="synthetic task variant: 'hard' adds noisy short "
                        "fold-backs + structural decoy negatives (round-5 "
                        "de-saturated benchmark)")
    p.add_argument("--workdir", default=str(REPO / "demo" / "zoo_run"))
    p.add_argument("--out", default=str(REPO / "demo" / "zoo"))
    p.add_argument("--platform", default=None, help="force jax platform (cpu for smoke)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s", datefmt="%H:%M:%S")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import flax.serialization
    import numpy as np

    import make_synthetic_dataset as synth
    from chimeralm_tpu.config import compose
    from chimeralm_tpu.data.collator import DataCollator
    from chimeralm_tpu.data.datamodule import ParquetDataModule
    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.runtime.trainer import CsvLogger, Trainer, TrainerConfig
    from chimeralm_tpu.utils import instantiate

    workdir = Path(args.workdir); workdir.mkdir(parents=True, exist_ok=True)
    out_root = Path(args.out); out_root.mkdir(parents=True, exist_ok=True)

    data_path = workdir / f"zoo_{args.mode}_{args.reads}_{args.min_len}_{args.max_len}_{args.seed}.parquet"
    if not data_path.exists():
        synth.generate(args.reads, data_path, seed=args.seed,
                       min_len=args.min_len, max_len=args.max_len, mode=args.mode)

    logger.info("platform=%s devices=%s", jax.default_backend(), jax.devices())
    table = {}
    for name in args.models:
        cfg = compose("train", [f"experiment={name}"])
        model_node = cfg["model"]
        if args.lr is not None:
            model_node["learning_rate"] = args.lr
        if args.dropout is not None:
            model_node["model"]["dropout"] = args.dropout
        task = instantiate(model_node)
        lr = model_node.get("learning_rate", 1e-4)
        if args.warmup_steps or args.head_lr_scale != 1.0:
            from chimeralm_tpu.runtime.optim import make_adamw, make_adamw_grouped

            wd = model_node.get("weight_decay", 0.01)
            if args.head_lr_scale != 1.0:
                # per-backbone classifier-head module names
                head_paths = {
                    "cnn": ("fc_0", "fc_bn", "fc_1"),
                    "transformer": ("attn_pool", "cls_0", "cls_1"),
                    "mamba": ("pooler_dense", "cls_0", "cls_1"),
                    "hyena": ("head",),
                }[name]
                task.optimizer = make_adamw_grouped(
                    lr, wd, warmup_steps=args.warmup_steps,
                    head_lr_scale=args.head_lr_scale, head_paths=head_paths,
                )
            else:
                task.optimizer = make_adamw(lr, wd, warmup_steps=args.warmup_steps)

        tok = CharacterTokenizer(model_max_length=args.ctx + 2, padding_side="right")
        dm = ParquetDataModule(
            tok, train_data_path=data_path, batch_size=args.batch_size,
            train_val_test_split=(0.8, 0.1, 0.1),
        )
        # one compiled (B, ctx) step per backbone
        dm.collator = DataCollator(tok, padding="max_length", max_length=args.ctx)

        ckpt_dir = workdir / f"ckpt_{name}"
        trainer = Trainer(
            task,
            TrainerConfig(
                max_epochs=args.epochs, seed=args.seed, learning_rate=lr,
                early_stop_patience=args.patience or max(6, args.epochs // 2),
                plateau_patience=max(4, args.epochs // 3),
                drop_last=True,
            ),
            ckpt_dir=ckpt_dir,
            loggers=[CsvLogger(workdir / f"metrics_{name}.csv")],
        )
        logger.info("=== %s: ctx=%d batch=%d lr=%g epochs=%d",
                    name, args.ctx, args.batch_size, lr, args.epochs)
        t0 = time.time()
        state = trainer.fit(dm)
        if trainer.best_ckpt_path is not None:
            state, _ = trainer.load_checkpoint(state, trainer.best_ckpt_path)
        test_metrics = trainer.test(state.params, dm, model_state=state.model_state)
        row = {
            "val_f1_best": trainer.callback_metrics.get("val/f1_best"),
            **{k: float(v) for k, v in test_metrics.items()},
            "seconds": round(time.time() - t0, 1),
        }
        table[name] = row
        logger.info("%s done: %s", name, row)

        out_dir = out_root / name; out_dir.mkdir(parents=True, exist_ok=True)
        params_np = jax.tree.map(np.asarray, state.params)
        payload = {"params": params_np, "step": int(state.step)}
        if state.model_state:
            payload["model_state"] = jax.tree.map(np.asarray, state.model_state)
        (out_dir / "checkpoint.msgpack").write_bytes(
            flax.serialization.msgpack_serialize(flax.serialization.to_state_dict(payload))
        )
        (out_dir / "meta.json").write_text(json.dumps({
            "model": name, "model_node": {k: v for k, v in model_node.items() if k != "_target_"},
            "ctx": args.ctx, "reads": args.reads,
            "read_len": [args.min_len, args.max_len],
            "batch_size": args.batch_size, "epochs": args.epochs,
            "lr": lr, "seed": args.seed, "dataset_mode": args.mode,
            "results": row,
        }, indent=2, default=str))

    # merge into the cross-invocation table (each run may train a subset)
    table_path = out_root / "table.json"
    merged = json.loads(table_path.read_text()) if table_path.exists() else {}
    merged.update(table)
    logger.info("zoo table: %s", json.dumps(merged, indent=2))
    table_path.write_text(json.dumps(merged, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
