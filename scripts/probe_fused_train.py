"""Staged compile/run probe of the fused training mixer (round 5).

The full fused-train step at 16x8192 failed to produce a first loss within
2400 s while the unfused route compiled in 532 s.  This probe times each
piece separately to localize compile or first-run pathology:

    python scripts/probe_fused_train.py --B 16 --L 8192
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=16)
    p.add_argument("--D", type=int, default=256)
    p.add_argument("--L", type=int, default=8192)
    p.add_argument("--stages", nargs="+",
                   default=["spectra", "block", "mixer", "train_fwd", "train_vjp"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from chimeralm_tpu.ops import pallas_dft as pd

    B, D, L = args.B, args.D, args.L
    interp = jax.default_backend() != "tpu"
    h = pd.BLOCK_H or pd._choose_block_h(D, L, interp)
    print(f"backend={jax.default_backend()} B={B} D={D} L={L} h={h} "
          f"geom={pd._block_geometry(L, h, interp)} "
          f"bc={pd._pick_bc_block(2 * h, D, L // h, interp) if h else None}",
          flush=True)

    key = jax.random.PRNGKey(0)
    uc3 = jax.random.normal(key, (B, 3 * D, L), jnp.bfloat16)
    u = uc3[:, :D]
    k = jax.random.normal(jax.random.PRNGKey(1), (D, L), jnp.float32) / 100
    bias = jnp.zeros((D,), jnp.float32)
    sw = jax.random.normal(jax.random.PRNGKey(2), (3 * D, 1, 3), jnp.float32) / 3
    sb = jnp.zeros((3 * D,), jnp.float32)

    def stage(name, fn):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name:12s} first call {time.perf_counter() - t0:8.1f} s", flush=True)
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name:12s} second call {time.perf_counter() - t0:8.3f} s", flush=True)

    if "spectra" in args.stages and h:
        f = jax.jit(lambda k_: pd.block_filter_spectra(k_, h))
        stage("spectra", lambda: f(k))
    if "block" in args.stages and h:
        kspec = jax.tree.map(jnp.asarray, pd.block_filter_spectra(k, h))
        f = jax.jit(lambda u_, ks: pd.dft_conv_pallas_block(u_, k, bias, kspec=ks))
        stage("block", lambda: f(u, kspec))
    if "mixer" in args.stages and h:
        kspec = jax.tree.map(jnp.asarray, pd.block_filter_spectra(k, h))
        f = jax.jit(lambda x, ks: pd.mixer_conv_fused(x, sw, sb, bias, ks))
        stage("mixer", lambda: f(uc3, kspec))
    if "train_fwd" in args.stages:
        f = jax.jit(lambda x, k_: pd.mixer_conv_fused_train(x, sw, sb, bias, k_))
        stage("train_fwd", lambda: f(uc3, k))
    if "train_vjp" in args.stages:
        def loss(x, k_):
            return pd.mixer_conv_fused_train(x, sw, sb, bias, k_).astype(jnp.float32).sum()

        f = jax.jit(jax.grad(loss, argnums=(0, 1)))
        stage("train_vjp", lambda: f(uc3, k))
    return 0


if __name__ == "__main__":
    sys.exit(main())
