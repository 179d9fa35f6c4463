"""Fused two-stage-DFT long convolution as a single Pallas TPU kernel.

The round-1 matmul-FFT (``chimeralm_tpu.ops.matmul_fft``) already moved the
Hyena long conv onto the MXU, but as an XLA einsum chain it stages every
(rows, n) complex intermediate through HBM — measured ~3-10x off the compute
roofline.  This kernel runs the whole pipeline per (channel-block, batch)
grid cell inside VMEM:

    load u block -> pad -> stage-1 DFT matmul -> twiddle -> stage-2 DFT
    matmul -> pointwise filter spectrum -> inverse stage matmuls -> real
    part -> + bias * u -> store y block

with zero HBM round-trips for intermediates.  The filter's spectrum is
computed once per channel-block (at batch index 0) and cached in VMEM
scratch across the batch grid dimension.

Layout trick: frequencies stay in the "scrambled" (k1, k2) coordinates of
the Cooley-Tukey split end-to-end — the filter spectrum is pre-scrambled the
same way, so no reordering between forward, pointwise, and inverse stages.

Math: k = k1 + n1*k2, j = j1*n2 + j2,
    X[k1,k2] = sum_j2 W_N^{-j2 k1} W_{n2}^{-j2 k2} (sum_j1 x[j1,j2] W_{n1}^{-j1 k1})
    y[j1,j2] = (1/n) sum_k1 W_{n1}^{+j1 k1} W_N^{+j2 k1} (sum_k2 P[k1,k2] W_{n2}^{+j2 k2})

Used for inference (the bench path); training differentiates through the
einsum implementation via a custom VJP (the conv is linear in u, and k/bias
gradients flow through ``fft_conv_matmul``'s autodiff).

Reference behavior: the fftconv of the HyenaDNA HF remote-code backbone
(reference: chimeralm/models/components/hyena.py:237; structural sketch
striped_hyena.py:69-80).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _factor(n: int) -> tuple[int, int]:
    """(n1, n2) with n1*n2 == n, both as square as possible (n1 <= n2)."""
    best = (1, n)
    for n1 in range(1, int(math.isqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


@functools.lru_cache(maxsize=None)
def _constants(n: int):
    """Forward/inverse DFT stage matrices + twiddles (numpy f32).

    Returns (n1, n2, f1r, f1i, twTr, twTi, f2r, f2i) with the forward sign
    (-2pi); inverse stages reuse the cosines and negate the sines.
    twT is the twiddle in (j2, k1) layout to match the kernel's data layout.
    """
    n1, n2 = _factor(n)
    a1 = -2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    a2 = -2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    at = -2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n  # (j2, k1)
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


#: DFT stage-matmul precision, same policy knob as the einsum path
#: (``chimeralm_tpu.ops.matmul_fft._PREC``).  Mosaic only lowers DEFAULT and
#: HIGHEST dot precisions inside kernels, so HIGH (3-pass bf16, the default
#: policy) is emulated manually: a@b = hi(a)@hi(b) + lo(a)@hi(b) + hi(a)@lo(b)
#: with single-pass bf16 dots.  Measured on TPU: DEFAULT alone is ~4e-3
#: relative error — enough to flip borderline labels (precision audit:
#: 99% agreement); the 3-pass split restores ~f32-grade accuracy.
_PREC = os.environ.get("CHIMERALM_FFT_PRECISION", "high").lower()


def _dot1(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if _PREC == "highest"
                   else jax.lax.Precision.DEFAULT),
    )


def _dot(a, b):
    if _PREC != "high":
        return _dot1(a, b)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return _dot1(a_hi, b_hi) + _dot1(a_lo, b_hi) + _dot1(a_hi, b_lo)


def _fwd_dft(x3, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc):
    """(bc, n1, n2) real -> scrambled spectrum (bc, n1, n2) complex pair."""
    # stage 1: contract j1 -> (bc, j2, k1)
    xt = jnp.swapaxes(x3, 1, 2).reshape(bc * n2, n1)
    br = _dot(xt, f1r).reshape(bc, n2, n1)
    bi = _dot(xt, f1i).reshape(bc, n2, n1)
    # twiddle in (j2, k1) layout
    cr = br * twTr[None] - bi * twTi[None]
    ci = br * twTi[None] + bi * twTr[None]
    # stage 2: contract j2 -> (bc, k1, k2)
    cr = jnp.swapaxes(cr, 1, 2).reshape(bc * n1, n2)
    ci = jnp.swapaxes(ci, 1, 2).reshape(bc * n1, n2)
    dr = (_dot(cr, f2r) - _dot(ci, f2i)).reshape(bc, n1, n2)
    di = (_dot(cr, f2i) + _dot(ci, f2r)).reshape(bc, n1, n2)
    return dr, di


def _dft_conv_kernel(
    u_ref, k_ref, bias_ref, f1r_ref, f1i_ref, twTr_ref, twTi_ref, f2r_ref, f2i_ref,
    out_ref, kspec_r, kspec_i,
    *, n: int, n1: int, n2: int, bc: int, L: int,
):
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twTr, twTi = twTr_ref[...], twTi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]

    # filter spectrum: computed once per channel-block, cached in scratch
    @pl.when(pl.program_id(1) == 0)
    def _():
        k = k_ref[...].astype(jnp.float32)  # (bc, L)
        k3 = jnp.pad(k, ((0, 0), (0, n - L))).reshape(bc, n1, n2)
        kr, ki = _fwd_dft(k3, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)
        kspec_r[...] = kr / n
        kspec_i[...] = ki / n

    u = u_ref[0].astype(jnp.float32)  # (bc, L)
    x3 = jnp.pad(u, ((0, 0), (0, n - L))).reshape(bc, n1, n2)
    ur, ui = _fwd_dft(x3, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)

    # pointwise filter product in the scrambled layout
    pr = ur * kspec_r[...] - ui * kspec_i[...]
    pi = ur * kspec_i[...] + ui * kspec_r[...]

    # inverse stage A: contract k2 (last) -> (bc, k1, j2); sines negate
    pr2 = pr.reshape(bc * n1, n2)
    pi2 = pi.reshape(bc * n1, n2)
    qr = (_dot(pr2, f2r) + _dot(pi2, f2i)).reshape(bc, n1, n2)
    qi = (_dot(pi2, f2r) - _dot(pr2, f2i)).reshape(bc, n1, n2)
    # inverse twiddle in (k1, j2) layout = twT transposed with + sign
    tbr = jnp.swapaxes(twTr, 0, 1)[None]
    tbi = -jnp.swapaxes(twTi, 0, 1)[None]
    rr = qr * tbr - qi * tbi
    ri = qr * tbi + qi * tbr
    # inverse stage B: contract k1 -> (bc, j2, j1); real part only
    rr2 = jnp.swapaxes(rr, 1, 2).reshape(bc * n2, n1)
    ri2 = jnp.swapaxes(ri, 1, 2).reshape(bc * n2, n1)
    yr = (_dot(rr2, f1r) + _dot(ri2, f1i)).reshape(bc, n2, n1)

    y = jnp.swapaxes(yr, 1, 2).reshape(bc, n)[:, :L]
    out_ref[0] = (y + u * bias_ref[...]).astype(out_ref.dtype)


def _cdft(xr, xi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc):
    """(bc, n1, n2) complex -> scrambled spectrum (bc, n1, n2) complex.

    Full complex two-stage DFT (8 stage matmuls); used by the batch-pair
    kernel where two real rows ride one complex signal.
    """
    xtr = jnp.swapaxes(xr, 1, 2).reshape(bc * n2, n1)
    xti = jnp.swapaxes(xi, 1, 2).reshape(bc * n2, n1)
    br = (_dot(xtr, f1r) - _dot(xti, f1i)).reshape(bc, n2, n1)
    bi = (_dot(xtr, f1i) + _dot(xti, f1r)).reshape(bc, n2, n1)
    cr = br * twTr[None] - bi * twTi[None]
    ci = br * twTi[None] + bi * twTr[None]
    cr = jnp.swapaxes(cr, 1, 2).reshape(bc * n1, n2)
    ci = jnp.swapaxes(ci, 1, 2).reshape(bc * n1, n2)
    dr = (_dot(cr, f2r) - _dot(ci, f2i)).reshape(bc, n1, n2)
    di = (_dot(cr, f2i) + _dot(ci, f2r)).reshape(bc, n1, n2)
    return dr, di


def _dft_conv_pair_kernel(
    u_ref, k_ref, bias_ref, f1r_ref, f1i_ref, twTr_ref, twTi_ref, f2r_ref, f2i_ref,
    out_ref, kspec_r, kspec_i,
    *, n: int, n1: int, n2: int, bc: int, L: int,
):
    """Two batch rows as one complex signal: conv is linear and the filter is
    shared per channel, so ``conv(u0 + i*u1, k) = conv(u0,k) + i*conv(u1,k)``
    — no Hermitian unpacking, ~1.5-1.7x fewer stage matmuls per row than the
    real-signal kernel."""
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twTr, twTi = twTr_ref[...], twTi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]

    @pl.when(pl.program_id(1) == 0)
    def _():
        k = k_ref[...].astype(jnp.float32)  # (bc, L)
        k3 = jnp.pad(k, ((0, 0), (0, n - L))).reshape(bc, n1, n2)
        kr, ki = _fwd_dft(k3, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)
        kspec_r[...] = kr / n
        kspec_i[...] = ki / n

    u0 = u_ref[0].astype(jnp.float32)  # (bc, L)
    u1 = u_ref[1].astype(jnp.float32)
    xr = jnp.pad(u0, ((0, 0), (0, n - L))).reshape(bc, n1, n2)
    xi = jnp.pad(u1, ((0, 0), (0, n - L))).reshape(bc, n1, n2)
    zr, zi = _cdft(xr, xi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)

    # pointwise: Z * K applies k to both packed rows at once
    pr = zr * kspec_r[...] - zi * kspec_i[...]
    pi = zr * kspec_i[...] + zi * kspec_r[...]

    # inverse stage A: multiply by conj(F2) over k2
    pr2 = pr.reshape(bc * n1, n2)
    pi2 = pi.reshape(bc * n1, n2)
    qr = (_dot(pr2, f2r) + _dot(pi2, f2i)).reshape(bc, n1, n2)
    qi = (_dot(pi2, f2r) - _dot(pr2, f2i)).reshape(bc, n1, n2)
    # inverse twiddle (conj)
    tbr = jnp.swapaxes(twTr, 0, 1)[None]
    tbi = -jnp.swapaxes(twTi, 0, 1)[None]
    rr = qr * tbr - qi * tbi
    ri = qr * tbi + qi * tbr
    # inverse stage B: full complex (both packed rows come back out)
    rr2 = jnp.swapaxes(rr, 1, 2).reshape(bc * n2, n1)
    ri2 = jnp.swapaxes(ri, 1, 2).reshape(bc * n2, n1)
    yr = (_dot(rr2, f1r) + _dot(ri2, f1i)).reshape(bc, n2, n1)
    yi = (_dot(ri2, f1r) - _dot(rr2, f1i)).reshape(bc, n2, n1)

    y0 = jnp.swapaxes(yr, 1, 2).reshape(bc, n)[:, :L]
    y1 = jnp.swapaxes(yi, 1, 2).reshape(bc, n)[:, :L]
    out_ref[0] = (y0 + u0 * bias_ref[...]).astype(out_ref.dtype)
    out_ref[1] = (y1 + u1 * bias_ref[...]).astype(out_ref.dtype)


def _pick_bc(n: int, D: int, interpret: bool = False, pair: bool = False) -> int | None:
    """Channel block: Mosaic needs the block's 2nd-to-last dim to be a
    multiple of 8, and the kernel must fit the 16M scoped-VMEM limit.
    Measured peaks: ~12.5 live (bc, n) f32 buffers for the real-signal
    kernel (25.04M at bc=8, n=65536), ~20.5 for the batch-pair kernel
    (20.43M at bc=32, n=8192).  Largest fitting multiple of 8 wins; None =
    does not fit (caller falls back: pair -> real kernel -> einsum).
    Interpret mode / non-TPU backends (CPU tests, including the
    patched-``pallas_call`` path) have neither constraint.
    """
    if interpret or jax.default_backend() != "tpu":
        return next((bc for bc in (16, 8, 4, 2, 1) if D % bc == 0), 1)
    live = 20.5 if pair else 12.5
    for bc in (32, 24, 16, 8):
        if D % bc == 0 and bc * n * 4 * live <= 15 * 1024 * 1024:
            return bc
    return None


def supported(n: int, D: int, L: int) -> bool:
    n1, n2 = _factor(n)
    return (
        n1 >= 64 and n1 % 8 == 0 and n2 % 128 == 0 and n == 2 * L
        and _pick_bc(n, D) is not None
    )


def dft_conv_pallas(u: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray, fft_size: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Causal linear convolution via the fused kernel.

    u: (B, D, L); k: (D, L) float32; bias: (D,).  Same contract as
    ``matmul_fft.fft_conv_matmul`` (zero-padded linear conv + bias*u).
    """
    B, D, L = u.shape
    n = fft_size
    n1, n2, *consts = _constants(n)
    # even batch: two rows per complex signal, if the bigger live set fits
    pair = B % 2 == 0 and _pick_bc(n, D, interpret=interpret, pair=True) is not None
    bc = _pick_bc(n, D, interpret=interpret, pair=pair)
    if bc is None:
        raise ValueError(f"dft_conv_pallas: no VMEM-fitting channel block for n={n}, D={D}")

    f1r, f1i, twTr, twTi, f2r, f2i = consts
    rows = 2 if pair else 1
    kern = _dft_conv_pair_kernel if pair else _dft_conv_kernel
    kernel = functools.partial(kern, n=n, n1=n1, n2=n2, bc=bc, L=L)
    # batch innermost: filter spectrum cached per c-block
    grid = (D // bc, B // rows)
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda c, b: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D, L), u.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, L), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
            const_spec((n1, n1)), const_spec((n1, n1)),
            const_spec((n2, n1)), const_spec((n2, n1)),
            const_spec((n2, n2)), const_spec((n2, n2)),
        ],
        out_specs=pl.BlockSpec((rows, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bc, n1, n2), jnp.float32),
            pltpu.VMEM((bc, n1, n2), jnp.float32),
        ],
        # only pass interpret when explicitly requested so tests can patch
        # pl.pallas_call with a partial(interpret=True) default
        **({"interpret": True} if interpret else {}),
        cost_estimate=pl.CostEstimate(
            flops=(8 if pair else 12) * B * D * n * (n1 + n2),
            bytes_accessed=(2 * B * D * L + 2 * D * L) * 4,
            transcendentals=0,
        ),
    )(
        u, k.astype(jnp.float32), bias.astype(jnp.float32).reshape(D, 1),
        jnp.asarray(f1r), jnp.asarray(f1i),
        jnp.asarray(twTr), jnp.asarray(twTi),
        jnp.asarray(f2r), jnp.asarray(f2i),
    )
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fft_conv_pallas(u, k, bias, fft_size):
    """Differentiable wrapper: Pallas forward, einsum-path autodiff backward."""
    return dft_conv_pallas(u, k, bias, fft_size)


def _fcp_fwd(u, k, bias, fft_size):
    return dft_conv_pallas(u, k, bias, fft_size), (u, k, bias)


def _fcp_bwd(fft_size, res, g):
    from chimeralm_tpu.ops.matmul_fft import fft_conv_matmul

    u, k, bias = res
    _, vjp = jax.vjp(lambda u_, k_, b_: fft_conv_matmul(u_, k_, b_, fft_size), u, k, bias)
    return vjp(g)


fft_conv_pallas.defvjp(_fcp_fwd, _fcp_bwd)
