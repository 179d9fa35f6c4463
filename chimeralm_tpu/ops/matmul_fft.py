"""FFT evaluated as MXU matmuls (two-stage Cooley-Tukey), real arithmetic.

XLA's native TPU FFT runs far off the hardware roofline — measured ~87% of
the flagship forward's wall time.  A length-N DFT with N = n1*n2 factors into

    X[k1 + n1*k2] = sum_j2 W_N^{j2 k1} * (sum_j1 x[j1*n2 + j2] W_n1^{j1 k1})
                                        * W_n2^{j2 k2}

i.e. a (n1 x n1) DFT matmul over axis j1, a pointwise twiddle, and a
(n2 x n2) DFT matmul over axis j2 — dense matmuls that tile the MXU.  ~50x
more FLOPs than a true FFT, but the MXU's throughput advantage over the
scalar FFT path more than pays for it.

Complex values are carried as explicit (re, im) float32 pairs: the TPU
backend in this environment rejects complex-dtype dots (UNIMPLEMENTED), and
real-pair form also lets the inverse stage compute only the real component
(all that the convolution needs).

Used by ``fft_conv`` when the backend is TPU (``method="auto"``); numerics
are validated against ``jnp.fft`` in tests (f32, HIGHEST matmul precision).
"""

from __future__ import annotations

import functools
import math

import os

import jax
import jax.numpy as jnp
import numpy as np

# f32 einsums on TPU decompose into bf16 MXU passes: HIGHEST = 6 passes,
# HIGH = 3.  HIGH keeps ~f32-grade accuracy for these DFT stages at half the
# MXU work; override with CHIMERALM_FFT_PRECISION=highest if bit-closeness
# to the XLA-FFT path matters more than speed.
_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("CHIMERALM_FFT_PRECISION", "high").lower()]


def _factor(n: int) -> tuple[int, int]:
    """Split n into (n1, n2) with n1*n2 == n, both as square as possible."""
    best = (1, n)
    for n1 in range(1, int(math.isqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


@functools.lru_cache(maxsize=None)
def _dft_constants(n: int, forward: bool):
    """Real/imag DFT-stage constants for length-n transforms (numpy f32)."""
    n1, n2 = _factor(n)
    sign = -2.0 if forward else 2.0
    j1 = np.arange(n1)
    a1 = sign * np.pi * np.outer(j1, j1) / n1
    j2 = np.arange(n2)
    a2 = sign * np.pi * np.outer(j2, j2) / n2
    at = sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    return (
        n1,
        n2,
        np.cos(a1).astype(np.float32),
        np.sin(a1).astype(np.float32),
        np.cos(at).astype(np.float32),
        np.sin(at).astype(np.float32),
        np.cos(a2).astype(np.float32),
        np.sin(a2).astype(np.float32),
    )


def _cfft_pair(xr, xi, n: int, forward: bool, imag_out: bool = True):
    """Two-stage DFT over the last axis on (re, im) pairs. x: (..., n)."""
    n1, n2, f1r, f1i, twr, twi, f2r, f2i = _dft_constants(n, forward)
    f1r, f1i, twr, twi, f2r, f2i = (jnp.asarray(m) for m in (f1r, f1i, twr, twi, f2r, f2i))
    lead = xr.shape[:-1]
    ar = xr.reshape(*lead, n1, n2)

    # stage 1: b[k1, j2] = sum_j1 a[j1, j2] F1[j1, k1]
    def stage1(real_part):
        return jnp.einsum("...jt,jk->...kt", real_part, f1r, precision=_PREC), jnp.einsum(
            "...jt,jk->...kt", real_part, f1i, precision=_PREC
        )

    br, bi = stage1(ar)
    if xi is not None:
        ai = xi.reshape(*lead, n1, n2)
        cr2 = jnp.einsum("...jt,jk->...kt", ai, f1r, precision=_PREC)
        ci2 = jnp.einsum("...jt,jk->...kt", ai, f1i, precision=_PREC)
        br, bi = br - ci2, bi + cr2

    # twiddle: c = b * W (elementwise complex multiply)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr

    # stage 2: d[k1, k2] = sum_j2 c[k1, j2] F2[j2, k2]
    dr = jnp.einsum("...kt,ts->...ks", cr, f2r, precision=_PREC) - jnp.einsum(
        "...kt,ts->...ks", ci, f2i, precision=_PREC
    )
    dr = jnp.swapaxes(dr, -1, -2).reshape(*lead, n)
    if not imag_out:
        return dr, None
    di = jnp.einsum("...kt,ts->...ks", cr, f2i, precision=_PREC) + jnp.einsum(
        "...kt,ts->...ks", ci, f2r, precision=_PREC
    )
    di = jnp.swapaxes(di, -1, -2).reshape(*lead, n)
    return dr, di


def _pad_to(x, n: int):
    L = x.shape[-1]
    if L < n:
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - L)])
    return x[..., :n]


def fft_pair(x: jnp.ndarray, n: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward DFT of a real last axis, zero-padded to n -> (re, im)."""
    return _cfft_pair(_pad_to(x.astype(jnp.float32), n), None, n, forward=True)


# complex-dtype convenience wrappers (tests / CPU use)
def fft(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if jnp.iscomplexobj(x):
        re, im = _cfft_pair(_pad_to(x.real.astype(jnp.float32), n), _pad_to(x.imag.astype(jnp.float32), n), n, True)
    else:
        re, im = fft_pair(x, n)
    return re + 1j * im


def ifft(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Unnormalized inverse DFT (matches irfft(..., norm="forward") scaling)."""
    re, im = _cfft_pair(
        _pad_to(x.real.astype(jnp.float32), n), _pad_to(x.imag.astype(jnp.float32), n), n, False
    )
    return re + 1j * im


def fft_conv_matmul(
    u: jnp.ndarray,
    k: jnp.ndarray,
    bias: jnp.ndarray,
    fft_size: int,
    max_chunk_elems: int = 1 << 24,
) -> jnp.ndarray:
    """Causal linear convolution via matmul-FFT; same contract as fft_conv.

    u: (B, D, L) real; k: (D, L) real; bias: (D,).

    The spectral pipeline (fft -> x k_f -> ifft.real) runs chunked over the
    batch dim with ``lax.map`` so intermediates stay ~``max_chunk_elems``
    elements per component instead of materializing (B*D, n).
    """
    B, D, L = u.shape
    u32 = u.astype(jnp.float32)
    kr, ki = fft_pair(k.astype(jnp.float32), fft_size)
    kr = kr / fft_size
    ki = ki / fft_size

    chunk_b = max(1, int(max_chunk_elems // max(D * fft_size, 1)))
    chunk_b = min(chunk_b, B)
    n_chunks = -(-B // chunk_b)
    pad_b = n_chunks * chunk_b - B
    u_pad = jnp.pad(u32, ((0, pad_b), (0, 0), (0, 0))) if pad_b else u32
    chunks = u_pad.reshape(n_chunks, chunk_b, D, L)

    def one_chunk(uc):
        # Real-pair packing: transform two real signals per complex DFT.
        # Forward: Z = F(x + i*y) -> X = (Z + conj(flip Z))/2,
        #          Y = (Z - conj(flip Z))/(2i)  (Hermitian split).
        # Inverse: z = F^-1(P + i*Q) -> re(z) = conv_x, im(z) = conv_y.
        rows = chunk_b * D
        half = rows // 2
        u2 = uc.reshape(rows, L)
        xr = u2[:half]
        xi = u2[half:]
        zr, zi = _cfft_pair(_pad_to(xr, fft_size), _pad_to(xi, fft_size), fft_size, forward=True)
        # conj(flip Z): index n-k mod n == roll of the reversed array
        zr_f = jnp.roll(zr[..., ::-1], 1, axis=-1)
        zi_f = jnp.roll(zi[..., ::-1], 1, axis=-1)
        ur_a, ui_a = (zr + zr_f) / 2, (zi - zi_f) / 2          # spectrum of xr rows
        ur_b, ui_b = (zi + zi_f) / 2, (zr_f - zr) / 2          # spectrum of xi rows
        ur = jnp.concatenate([ur_a, ur_b], axis=0).reshape(chunk_b, D, fft_size)
        ui = jnp.concatenate([ui_a, ui_b], axis=0).reshape(chunk_b, D, fft_size)
        pr = (ur * kr[None] - ui * ki[None]).reshape(rows, fft_size)
        pi = (ur * ki[None] + ui * kr[None]).reshape(rows, fft_size)
        # pack two product-spectra per inverse transform: re -> first signal,
        # im -> second (linearity; both convolutions are real)
        yr, yi = _cfft_pair(
            pr[:half] - pi[half:], pi[:half] + pr[half:], fft_size, forward=False
        )
        y = jnp.concatenate([yr, yi], axis=0)
        return y[..., :L].reshape(chunk_b, D, L)

    def one_chunk_odd(uc):
        rows = chunk_b * D
        ur, ui = fft_pair(uc.reshape(rows, L), fft_size)
        ur = ur.reshape(chunk_b, D, fft_size)
        ui = ui.reshape(chunk_b, D, fft_size)
        pr = ur * kr[None] - ui * ki[None]
        pi = ur * ki[None] + ui * kr[None]
        yr, _ = _cfft_pair(
            pr.reshape(rows, fft_size), pi.reshape(rows, fft_size), fft_size, forward=False, imag_out=False
        )
        return yr[..., :L].reshape(chunk_b, D, L)

    if (chunk_b * D) % 2:
        one_chunk = one_chunk_odd

    if n_chunks == 1:
        y = one_chunk(chunks[0])
    else:
        y = jax.lax.map(one_chunk, chunks).reshape(n_chunks * chunk_b, D, L)[:B]
    return (y + u32 * bias[None, :, None]).astype(u.dtype)
