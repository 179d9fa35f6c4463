"""Training-step throughput benchmark (fwd+bwd+AdamW) on the real chip.

Times the jitted flagship train step at the read-length-curriculum shapes
and reports ms/step + Mtok/s per configuration.  The main comparison knob
is the long-conv backward route:

* fused   — ``conv_bwd_pallas`` (flip-identity du + batch-summed
            correlation kernel), the default on TPU
* einsum  — ``CHIMERALM_PALLAS_BWD=0``: autodiff through the matmul-FFT
            einsum path (the pre-round-4 behavior)

Run each route in a SEPARATE process (the env var is read at import):

    python scripts/bench_train_step.py --shapes 16x8192 4x32768
    CHIMERALM_PALLAS_BWD=0 python scripts/bench_train_step.py --shapes 16x8192
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="+", default=["16x8192", "4x32768"],
                   help="BxL train-step shapes")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from chimeralm_tpu.models.hyena import HyenaDnaClassifier, small_32k_config
    from chimeralm_tpu.runtime.task import ClassificationTask

    route = "fused" if os.environ.get("CHIMERALM_PALLAS_BWD", "1") != "0" else "einsum"
    if os.environ.get("CHIMERALM_FUSED_TRAIN", "1") == "0":
        route += "+unfused_fwd"
    else:
        route += "+fused_train_mixer"  # round-5 fused training forward (custom VJP)
    print(f"[train-bench] backend={jax.default_backend()} bwd_route={route}",
          file=sys.stderr, flush=True)

    config = small_32k_config(
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    model = HyenaDnaClassifier(config)
    task = ClassificationTask(model)
    rng = np.random.default_rng(0)

    results = {}
    for shape in args.shapes:
        B, L = (int(x) for x in shape.split("x"))
        ids = jnp.asarray(rng.integers(7, 11, size=(B, L)), jnp.int32)
        batch = {
            "input_ids": ids,
            "attention_mask": jnp.ones_like(ids),
            "labels": jnp.asarray(rng.integers(0, 2, size=(B,)), jnp.int32),
        }
        state = task.init_state(jax.random.PRNGKey(0), ids[:1, :128])
        train_step = jax.jit(task.train_step, donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        t_compile = time.perf_counter()
        state, metrics = train_step(state, batch, key)
        # first-step loss from a fixed init: the cross-route parity probe
        # (fused_train vs unfused forwards must agree to ~5e-4)
        print(f"[train-bench] {shape} first-step loss {float(metrics['loss']):.6f}",
              file=sys.stderr, flush=True)
        for _ in range(max(args.warmup - 1, 0)):
            state, metrics = train_step(state, batch, key)
        # relay note: block_until_ready can return early through axon; a
        # D2H fetch is the reliable sync point
        float(metrics["loss"])
        compile_s = time.perf_counter() - t_compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = train_step(state, batch, key)
        loss = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        results[shape] = {
            "ms_per_step": round(dt * 1e3, 1),
            "mtok_per_s": round(B * L / dt / 1e6, 3),
            "loss": round(loss, 4),
            "warmup_s": round(compile_s, 1),
        }
        print(f"[train-bench] {shape}: {results[shape]}", file=sys.stderr, flush=True)

    print(json.dumps({"route": route, "dtype": args.dtype, **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
