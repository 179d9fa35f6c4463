"""Per-bucket forward-time ablation profile of the flagship predict path.

Isolates where the steady-state per-batch device time goes by timing the
jitted inference forward under controlled ablations:

* ``full``      — the production graph (bf16, filter cache incl. block
                  spectra — the fused-mixer route, exactly what the engine
                  jits; ``--no-spectra`` restores the round-3 unfused path)
* ``noconv``    — ``fft_conv`` replaced by identity (everything but the DFTs;
                  forces the unfused mixer so the patch actually fires)
* ``nomixer``   — the whole Hyena mixer replaced by identity (embed+MLP+head)
* ``nomlp``     — the block MLPs replaced by zeros (isolates their matmuls)

The difference full-noconv is the long-conv cost; noconv-nomixer is the
projections/short-conv/gating cost; nomixer is the rest (embedding, MLPs,
norms, head).  Run on the real chip:

    python scripts/profile_forward.py --buckets 2048 4096 8192 16384 32768
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def time_fn(fn, args, iters: int, warmup: int = 2) -> float:
    # NB: through the axon relay ``block_until_ready`` returns before device
    # execution completes; a D2H fetch (np.asarray) is the only reliable
    # synchronization point, so each measured loop ends with one fetch.
    import numpy as np

    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--buckets", type=int, nargs="+",
                   default=[2048, 4096, 8192, 16384, 32768])
    p.add_argument("--tokens-per-batch", type=int, default=262144)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--fft-method", default="auto")
    p.add_argument("--variants", nargs="+",
                   default=["full", "noconv", "nomixer", "nomlp"])
    p.add_argument("--no-spectra", action="store_true",
                   help="omit the cached filter block spectra (unfused mixer)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import chimeralm_tpu.models.hyena as hyena_mod
    from chimeralm_tpu.models.hyena import HyenaDnaClassifier, small_32k_config

    cfg = small_32k_config(
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        fft_method=args.fft_method,
    )
    model = HyenaDnaClassifier(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128), jnp.int32))["params"]
    params = jax.device_put(params)

    real_fft_conv = hyena_mod.fft_conv
    real_call = hyena_mod.HyenaOperator.__call__
    real_mlp = hyena_mod.HyenaMlp.__call__
    spectra = not args.no_spectra

    def set_variant(name: str):
        nonlocal spectra
        hyena_mod.fft_conv = real_fft_conv
        hyena_mod.HyenaOperator.__call__ = real_call
        hyena_mod.HyenaMlp.__call__ = real_mlp
        spectra = not args.no_spectra
        if name == "noconv":
            hyena_mod.fft_conv = lambda u, k, bias, **kw: u
            spectra = False  # unfused route, so the identity patch fires
        elif name == "nomixer":
            hyena_mod.HyenaOperator.__call__ = (
                lambda self, u, deterministic=True, k_cached=None: u
            )
        elif name == "nomlp":
            hyena_mod.HyenaMlp.__call__ = lambda self, x: x * 0.0

    def augment(k_time, L, rows):
        """Attach per-order filter spectra (mirrors PredictEngine's cache):
        direct spectra below the block floor, m-block spectra above."""
        from chimeralm_tpu.ops.pallas_dft import (
            _MIN_BLOCK_L,
            block_spectra_for_length,
            direct_filter_spectra,
            mixer_fused_direct_available,
        )

        order, D = cfg.hyena_order, cfg.d_model
        k = k_time.reshape(L, order - 1, D).transpose(1, 2, 0)
        if L < _MIN_BLOCK_L and mixer_fused_direct_available(D, L, rows):
            n = 1
            while n < 2 * L:
                n <<= 1
            return (k_time, tuple(direct_filter_spectra(k[o], n) for o in range(order - 1)))
        specs = tuple(block_spectra_for_length(k[o], L) for o in range(order - 1))
        if any(s is None for s in specs):
            return k_time
        return (k_time, specs)

    results = {}
    for variant in args.variants:
        set_variant(variant)

        def forward(params, ids, mask, fc):
            return model.apply(
                {"params": params}, ids, attention_mask=mask,
                deterministic=True, filter_cache=fc,
            ).astype(jnp.float32)

        fwd = jax.jit(forward)
        filt = jax.jit(
            lambda params, L: model.apply({"params": params}, L, method="filters"),
            static_argnums=1,
        )
        for L in args.buckets:
            rows = max(1, args.tokens_per_batch // L)
            key = jax.random.PRNGKey(L)
            ids = jax.random.randint(key, (rows, L), 0, 11, jnp.int32)
            mask = jnp.ones((rows, L), jnp.int32)
            if variant == "nomixer":
                fc = None
            else:
                fc = jax.block_until_ready(filt(params, L))
                if spectra:
                    fc = tuple(augment(k_layer, L, rows) for k_layer in fc)
            dt = time_fn(fwd, (params, ids, mask, fc), args.iters)
            mtoks = rows * L / dt / 1e6
            results[f"{variant}/{L}"] = round(dt * 1e3, 2)
            print(f"{variant:8s} L={L:6d} rows={rows:4d}  {dt*1e3:8.2f} ms  {mtoks:7.2f} Mtok/s",
                  flush=True)

    set_variant("full")
    print(json.dumps({"tokens_per_batch": args.tokens_per_batch,
                      "dtype": args.dtype, "fft_method": args.fft_method,
                      "ms": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
