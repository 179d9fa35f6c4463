"""Microbenchmark of the fused DFT-conv kernels on the real chip.

Answers the round-5 routing question: is the m-block kernel MXU-bound
(time scales with the 3-pass bf16 precision policy => cut stage MACs) or
layout/VPU-bound (attack transposes and twiddles instead)?

    python scripts/kernel_microbench.py --prec high
    python scripts/kernel_microbench.py --prec default

Run each precision in its OWN process (_PREC is read at import).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--prec", default=None, choices=["default", "high", "highest"])
    p.add_argument("--B", type=int, default=8)
    p.add_argument("--D", type=int, default=256)
    p.add_argument("--L", type=int, default=32768)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--what", nargs="+",
                   default=["block", "mixer", "matmul", "corr"])
    args = p.parse_args()
    if args.prec:
        os.environ["CHIMERALM_FFT_PRECISION"] = args.prec

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from chimeralm_tpu.ops import pallas_dft as pd

    B, D, L = args.B, args.D, args.L
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (B, D, L), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (D, L), jnp.float32) / 100
    bias = jnp.zeros((D,), jnp.float32)

    def timeit(name, fn, *a):
        out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])  # relay-safe sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.iters
        toks = B * L
        print(f"{name:28s} {dt*1e3:8.2f} ms  {toks/dt/1e6:7.2f} Mtok/s", flush=True)
        return dt

    prec = os.environ.get("CHIMERALM_FFT_PRECISION", "high")
    print(f"prec={prec} B={B} D={D} L={L}", flush=True)

    h = pd.BLOCK_H or pd._choose_block_h(D, L)
    if "block" in args.what and h:
        kspec = jax.tree.map(jnp.asarray, pd.block_filter_spectra(k, h))
        f = jax.jit(lambda u_, ks: pd.dft_conv_pallas_block(u_, k, bias, kspec=ks))
        dt = timeit(f"block_conv h={h}", f, u, kspec)
        m, n, n1, n2 = pd._block_geometry(L, h)
        # 10m dots per 2 blocks geometry -> f32-MACs/token/channel, x passes
        passes = pd._PASSES.get(prec, 3)
        macs = (6 * m + 4 * ((m + 1) // 2) * 2) / m * n * 128 / (2 * h) * passes * B * D * L
        print(f"  stage bf16-MACs {macs:.3e}  -> {macs/dt/1e12:.1f} TMAC/s "
              f"({macs/dt/197e12*100:.0f}% of v5e peak)", flush=True)

    if "mixer" in args.what and h:
        kspec = jax.tree.map(jnp.asarray, pd.block_filter_spectra(k, h))
        w = jax.random.normal(jax.random.PRNGKey(2), (3 * D, 1, 3), jnp.float32) / 3
        bw = jnp.zeros((3 * D,), jnp.float32)
        uc3 = jax.random.normal(key, (B, 3 * D, L), jnp.bfloat16)
        f = jax.jit(lambda x, ks: pd.mixer_conv_fused(x, w, bw, bias, ks))
        timeit("mixer_fused", f, uc3, kspec)

    if "matmul" in args.what:
        # reference point: plain XLA bf16 matmul chain of similar MAC volume
        a = jax.random.normal(key, (B * L // 128, 128), jnp.bfloat16)
        bmat = jax.random.normal(key, (128, 128), jnp.bfloat16)

        def chain(x):
            for _ in range(40):
                x = jax.lax.dot_general(
                    x, bmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16)
            return x

        fm = jax.jit(chain)
        dt = timeit("xla_matmul_chain x40", fm, a)
        macs = 40 * (B * L // 128) * 128 * 128
        print(f"  MACs {macs:.3e} -> {macs/dt/1e12:.1f} TMAC/s "
              f"({macs/dt/197e12*100:.0f}% of v5e peak)", flush=True)

    if "corr" in args.what and pd.supported_corr(D, L, B):
        g = jax.random.normal(jax.random.PRNGKey(3), (B, D, L), jnp.bfloat16)
        f = jax.jit(lambda u_, g_: pd.dft_corr_pallas(u_, g_))
        timeit("corr (dk backward)", f, u, g)
    return 0


if __name__ == "__main__":
    sys.exit(main())
