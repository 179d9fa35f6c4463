"""FFT evaluated as MXU matmuls (two-stage Cooley-Tukey).

XLA's native TPU FFT runs far off the hardware roofline — measured ~87% of
the flagship forward's wall time.  A length-N DFT with N = n1*n2 factors into

    X[k1 + n1*k2] = sum_j2 W_N^{j2 k1} * (sum_j1 x[j1*n2 + j2] W_n1^{j1 k1})
                                        * W_n2^{j2 k2}

i.e. a (n1 x n1) DFT matmul over axis j1, a pointwise twiddle, and a
(n2 x n2) DFT matmul over axis j2 — all dense matmuls that tile the MXU.
~50x more FLOPs than an actual FFT, but the MXU's throughput advantage over
the scalar FFT path more than pays for it.

Used by ``fft_conv`` when the backend is TPU (``method="auto"``); numerics
are validated against ``jnp.fft`` in tests (f32, HIGHEST matmul precision).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _factor(n: int) -> tuple[int, int]:
    """Split n into (n1, n2) with n1*n2 == n, both as square as possible."""
    best = (1, n)
    for n1 in range(1, int(math.isqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


@functools.lru_cache(maxsize=None)
def _dft_constants(n: int, forward: bool):
    """(F_n1, twiddle, F_n2) numpy complex64 constants for length-n DFT."""
    n1, n2 = _factor(n)
    sign = -2j if forward else 2j
    j1 = np.arange(n1)
    f1 = np.exp(sign * np.pi * np.outer(j1, j1) / n1).astype(np.complex64)  # (j1, k1)
    j2 = np.arange(n2)
    f2 = np.exp(sign * np.pi * np.outer(j2, j2) / n2).astype(np.complex64)  # (j2, k2)
    tw = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n).astype(
        np.complex64
    )  # (k1, j2)
    return n1, n2, f1, tw, f2


def _cfft(x: jnp.ndarray, n: int, forward: bool) -> jnp.ndarray:
    """Complex DFT over the last axis via two matmul stages. x: (..., n)."""
    n1, n2, f1, tw, f2 = _dft_constants(n, forward)
    lead = x.shape[:-1]
    a = x.reshape(*lead, n1, n2)
    # stage 1: DFT over j1 -> (..., k1, j2)
    b = jnp.einsum("...jt,jk->...kt", a, jnp.asarray(f1), precision=jax.lax.Precision.HIGHEST)
    # twiddle
    c = b * jnp.asarray(tw)
    # stage 2: DFT over j2 -> (..., k1, k2)
    d = jnp.einsum("...kt,ts->...ks", c, jnp.asarray(f2), precision=jax.lax.Precision.HIGHEST)
    # X[k1 + n1*k2] -> transpose (k1, k2) -> (k2, k1) then flatten
    return jnp.swapaxes(d, -1, -2).reshape(*lead, n)


def fft(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Forward complex DFT of the last axis, zero-padded/truncated to n."""
    L = x.shape[-1]
    if L < n:
        x = jnp.pad(x.astype(jnp.complex64), [(0, 0)] * (x.ndim - 1) + [(0, n - L)])
    else:
        x = x[..., :n].astype(jnp.complex64)
    return _cfft(x, n, forward=True)


def ifft(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Unnormalized inverse DFT (matches irfft(..., norm="forward") scaling)."""
    return _cfft(x.astype(jnp.complex64), n, forward=False)


def fft_conv_matmul(
    u: jnp.ndarray,
    k: jnp.ndarray,
    bias: jnp.ndarray,
    fft_size: int,
    max_chunk_elems: int = 1 << 24,
) -> jnp.ndarray:
    """Causal linear convolution via matmul-FFT; same contract as fft_conv.

    u: (B, D, L) real; k: (D, L) real; bias: (D,).

    The spectral pipeline (fft -> x k_f -> ifft) runs chunked over the batch
    dim with ``lax.map`` so complex intermediates stay ~``max_chunk_elems``
    elements (128 MB at complex64) instead of materializing (B*D, n).
    """
    B, D, L = u.shape
    u32 = u.astype(jnp.float32)
    k_f = fft(k.astype(jnp.float32), fft_size) / fft_size  # (D, n)

    chunk_b = max(1, int(max_chunk_elems // max(D * fft_size, 1)))
    chunk_b = min(chunk_b, B)
    n_chunks = -(-B // chunk_b)
    pad_b = n_chunks * chunk_b - B
    u_pad = jnp.pad(u32, ((0, pad_b), (0, 0), (0, 0))) if pad_b else u32
    chunks = u_pad.reshape(n_chunks, chunk_b, D, L)

    def one_chunk(uc):
        rows = chunk_b * D
        u_f = fft(uc.reshape(rows, L), fft_size).reshape(chunk_b, D, fft_size)
        prod = (u_f * k_f[None]).reshape(rows, fft_size)
        return ifft(prod, fft_size).real[..., :L].reshape(chunk_b, D, L)

    if n_chunks == 1:
        y = one_chunk(chunks[0])
    else:
        y = jax.lax.map(one_chunk, chunks).reshape(n_chunks * chunk_b, D, L)[:B]
    return (y + u32 * bias[None, :, None]).astype(u.dtype)
