"""A/B microbench: per-batch host metric merge vs in-jit accumulation.

VERDICT r1 weak-item 5 / next-item 8: the round-1 trainer merged
ConfusionCounts on host every eval batch — one D2H fetch per batch, the same
relay roundtrip the predictor works hard to amortize.  The round-2 trainer
accumulates inside jit (donated accumulator) and fetches once per epoch.
This measures both paths on identical batches and prints the per-batch cost.

Usage (TPU):
    python scripts/bench_eval_loop.py --batches 50 --ctx 8192 --batch-size 8
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", type=int, default=50)
    p.add_argument("--ctx", type=int, default=8192)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--n-layer", type=int, default=4)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from chimeralm_tpu.models.hyena import HyenaConfig, HyenaDnaClassifier
    from chimeralm_tpu.runtime.task import ClassificationTask

    cfg = HyenaConfig(
        d_model=args.d_model, n_layer=args.n_layer, d_inner=4 * args.d_model,
        max_seq_len=32768, dtype=jnp.bfloat16,
    )
    task = ClassificationTask(HyenaDnaClassifier(config=cfg))
    state = task.init_state(jax.random.PRNGKey(0), jnp.zeros((1, args.ctx), jnp.int32))

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 12, size=(args.batch_size, args.ctx)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, size=(args.batch_size,)), jnp.int64),
    }

    # -- A: per-batch host merge (round-1 semantics: jit_steps + host fetch)
    _, eval_step = task.jit_steps()
    merged = None
    eval_step(state.params, batch)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(args.batches):
        m = eval_step(state.params, batch)
        # D2H fetch per batch: loss + confusion counts to host scalars
        leaves = [float(x) for x in jax.tree.leaves(
            {"loss": m["loss"], "counts": m["counts"], "n": m["n"]})]
        merged = leaves if merged is None else [a + b for a, b in zip(merged, leaves)]
    t_host = (time.perf_counter() - t0) / args.batches

    # -- B: in-jit accumulation (round-2 semantics: jit_steps_acc, one fetch)
    _, eval_acc = task.jit_steps_acc()
    acc = task.zero_acc()
    acc = eval_acc(state.params, batch, None, acc)  # compile
    jax.block_until_ready(jax.tree.leaves(acc))
    acc = task.zero_acc()
    t0 = time.perf_counter()
    for _ in range(args.batches):
        acc = eval_acc(state.params, batch, None, acc)
    final = {"loss": float(acc["loss"].compute()), "f1": float(acc["counts"].f1())}
    t_jit = (time.perf_counter() - t0) / args.batches

    print(f"platform={jax.default_backend()} ctx={args.ctx} B={args.batch_size} "
          f"batches={args.batches}")
    print(f"host-merge eval step: {t_host * 1e3:8.2f} ms/batch")
    print(f"in-jit accumulation:  {t_jit * 1e3:8.2f} ms/batch "
          f"({(t_host - t_jit) * 1e3:+.2f} ms, {t_host / t_jit:.2f}x)")
    print(f"final metrics (B path): {final}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
