"""Fused two-stage-DFT long convolution as a single Pallas TPU kernel.

The round-1 matmul-FFT (``chimeralm_tpu.ops.matmul_fft``) already moved the
Hyena long conv onto the MXU, but as an XLA einsum chain it stages every
(rows, n) complex intermediate through HBM — measured ~3-10x off the compute
roofline.  These kernels run the whole pipeline per (channel-block, batch)
grid cell inside VMEM:

    load u block -> pad -> stage-1 DFT matmul -> twiddle -> stage-2 DFT
    matmul -> pointwise filter spectrum -> inverse stage matmuls -> real
    part -> + bias * u -> store y block

with zero HBM round-trips for intermediates.

Three kernel variants, auto-selected by a TPU-shootout-calibrated cost
model (``_select_kernel``; measurements in docs/roadmap.md):

* ``real`` — real signal through a full-n two-stage DFT; filter spectrum
  computed once per channel-block (batch grid index 0) into VMEM scratch.
* ``pair`` — two batch rows ride one complex DFT (conv is linear, filter
  shared per channel); wins the 4k/8k buckets.
* ``half`` — rfft-style even/odd packing runs a length-n/2 complex DFT
  with Hermitian reconstruction; dots pinned to HIGHEST (see _PREC_HALF);
  its filter spectrum is hoisted OUT of the kernel (``half_filter_spectrum``).

The 32k bucket (n = 65536) hits Mosaic compiler crashes in every direct
variant (bisected bounds: bc = 8 only and m1/m2 <= 128 for half; pl.when
filter branch + inverse stages crash; >=32k-lane interface blocks, dual
outputs, and non-swap-form stores crash).  It runs instead as a 3-call
overlap-add over proven n/2 sub-convs (``dft_conv_pallas_oa``), using the
kernels' ``part=head|tail|full`` output ranges.

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

#: The half-complex kernel runs its dots at HIGHEST (native f32-emulating
#: MXU passes): measured on TPU, 3-pass "high" loses ~47x accuracy through
#: the Hermitian-reconstruction arithmetic (2.2e-3 vs exact) while HIGHEST
#: is 3e-7 and the kernel STILL beats the einsum-high path 2x at the 16k
#: bucket (19.4 ms vs 39.0 ms).  Override for experiments only.
_PREC_HALF = os.environ.get("CHIMERALM_FFT_PRECISION_HALF", "highest").lower()


def _dot1(a, b, prec=None):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if (prec or _PREC) == "highest"
                   else jax.lax.Precision.DEFAULT),
    )


def _dot(a, b, prec=None):
    if (prec or _PREC) != "high":
        return _dot1(a, b, prec)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return _dot1(a_hi, b_hi) + _dot1(a_lo, b_hi) + _dot1(a_hi, b_lo)


def _dot_h(a, b):
    """Half-kernel dot: pinned to the ``_PREC_HALF`` policy."""
    return _dot(a, b, _PREC_HALF)


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
    *, n: int, n1: int, n2: int, bc: int, L: int, part: str = "head",
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

    yfull = jnp.swapaxes(yr, 1, 2).reshape(bc, n)
    if part == "full":
        out_ref[0] = (yfull + jnp.pad(u * bias_ref[...], ((0, 0), (0, n - L)))).astype(out_ref.dtype)
    else:
        y = yfull[:, L:] if part == "tail" else yfull[:, :L]
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
    *, n: int, n1: int, n2: int, bc: int, L: int, part: str = "head",
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

    y0full = jnp.swapaxes(yr, 1, 2).reshape(bc, n)
    y1full = jnp.swapaxes(yi, 1, 2).reshape(bc, n)
    if part == "full":
        pad = lambda v: jnp.pad(v, ((0, 0), (0, n - L)))  # noqa: E731
        out_ref[0] = (y0full + pad(u0 * bias_ref[...])).astype(out_ref.dtype)
        out_ref[1] = (y1full + pad(u1 * bias_ref[...])).astype(out_ref.dtype)
    else:
        sl = (slice(None), slice(L, None) if part == "tail" else slice(None, L))
        out_ref[0] = (y0full[sl] + u0 * bias_ref[...]).astype(out_ref.dtype)
        out_ref[1] = (y1full[sl] + u1 * bias_ref[...]).astype(out_ref.dtype)


def _cidft(pr, pi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc):
    """Scrambled spectrum (bc, n1, n2) -> time domain (bc, n), complex.

    Unnormalized inverse (conjugate stages of ``_fwd_dft``); returns both
    components — the packed-inverse trick reads two real convolution
    results out of one complex transform (re and im)."""
    pr2 = pr.reshape(bc * n1, n2)
    pi2 = pi.reshape(bc * n1, n2)
    qr = (_dot(pr2, f2r) + _dot(pi2, f2i)).reshape(bc, n1, n2)
    qi = (_dot(pi2, f2r) - _dot(pr2, f2i)).reshape(bc, n1, n2)
    tbr = jnp.swapaxes(twTr, 0, 1)[None]
    tbi = -jnp.swapaxes(twTi, 0, 1)[None]
    rr = qr * tbr - qi * tbi
    ri = qr * tbi + qi * tbr
    rr2 = jnp.swapaxes(rr, 1, 2).reshape(bc * n2, n1)
    ri2 = jnp.swapaxes(ri, 1, 2).reshape(bc * n2, n1)
    yr = (_dot(rr2, f1r) + _dot(ri2, f1i)).reshape(bc, n2, n1)
    yi = (_dot(ri2, f1r) - _dot(rr2, f1i)).reshape(bc, n2, n1)
    yr = jnp.swapaxes(yr, 1, 2).reshape(bc, n1 * n2)
    yi = jnp.swapaxes(yi, 1, 2).reshape(bc, n1 * n2)
    return yr, yi


def _packed_fwd2(b0, b1, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc):
    """Spectra of TWO real (bc, n) signals from ONE complex DFT.

    z = b0 + i*b1; DFT(z) and DFT(conj z) share the four stage-1 matmul
    products (the trick of ``_half_fwd``), then U0 = (Z + Zf)/2 and
    U1 = (Z - Zf)/(2i).  8 stage dots for two spectra — the same economics
    as the batch-pair kernel, applied across sequence *blocks*."""
    x0 = b0.reshape(bc, n1, n2)
    x1 = b1.reshape(bc, n1, n2)
    xt0 = jnp.swapaxes(x0, 1, 2).reshape(bc * n2, n1)
    xt1 = jnp.swapaxes(x1, 1, 2).reshape(bc * n2, n1)
    p1 = _dot(xt0, f1r)
    p2 = _dot(xt0, f1i)
    p3 = _dot(xt1, f1r)
    p4 = _dot(xt1, f1i)

    def stage2(br, bi):
        br = br.reshape(bc, n2, n1)
        bi = bi.reshape(bc, n2, n1)
        cr = br * twTr[None] - bi * twTi[None]
        ci = br * twTi[None] + bi * twTr[None]
        cr = jnp.swapaxes(cr, 1, 2).reshape(bc * n1, n2)
        ci = jnp.swapaxes(ci, 1, 2).reshape(bc * n1, n2)
        dr = (_dot(cr, f2r) - _dot(ci, f2i)).reshape(bc, n1, n2)
        di = (_dot(cr, f2i) + _dot(ci, f2r)).reshape(bc, n1, n2)
        return dr, di

    zr, zi = stage2(p1 - p4, p2 + p3)      # Z  = DFT(b0 + i b1)
    zfr, zfi = stage2(p1 + p4, p2 - p3)    # Zf = DFT(b0 - i b1)
    u0 = (0.5 * (zr + zfr), 0.5 * (zi + zfi))
    u1 = (0.5 * (zi - zfi), 0.5 * (zfr - zr))
    return u0, u1


def _dft_conv_block_kernel(
    u_ref, kr_ref, ki_ref, bias_ref, f1r_ref, f1i_ref, twTr_ref, twTi_ref, f2r_ref, f2i_ref,
    out_ref,
    *, n: int, n1: int, n2: int, bc: int, L: int, m: int,
):
    """m-block decomposition of the long conv at block fft size n = 2h.

    u and k split into m blocks of h = L/m; every cross-block sub-conv
    (i, j) with i + j < m contributes to the causal output, and ALL of them
    share the m forward block-DFTs: S_t = sum_{i+j=t} U_i * K_j, then one
    inverse per output block (packed two-per-complex-transform).  Total
    transforms: ceil(m/2) packed forward + ceil(m/2) packed inverse at
    n = 2h — vs the 3-call overlap-add's 6 unpacked transforms at 2L.
    Output block t = head(inv S_t) + tail(inv S_{t-1}).

    The filter block spectra arrive precomputed (``block_filter_spectra``,
    scaled 1/n): keeping their DFT inside the kernel costs 2m VMEM scratch
    buffers + transients — the m = 4 variant measured 18.75M of scoped
    stack against the 16M limit (hence also no pl.when branch, which is a
    known Mosaic crash vector with inverse stages).
    """
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twTr, twTi = twTr_ref[...], twTi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]
    h = n // 2

    # VMEM discipline (the m = 4 variant sits right at the 16M scoped
    # limit): u blocks are sliced/cast/padded one at a time (never a full
    # (bc, L) f32 copy), outputs are stored per block (no concat buffer),
    # and only the previous inverse stays live across the store loop.
    def ublock(t):
        b = u_ref[0, :, t * h : (t + 1) * h].astype(jnp.float32)
        return jnp.pad(b, ((0, 0), (0, n - h)))

    us = []
    for p in range(0, m - 1, 2):
        s0, s1 = _packed_fwd2(
            ublock(p), ublock(p + 1), f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc
        )
        us += [s0, s1]
    if m % 2:
        b = ublock(m - 1).reshape(bc, n1, n2)
        us.append(_fwd_dft(b, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc))

    def spectrum_pair(t):
        """W = S_t + i*S_{t+1} accumulated directly (2 live buffers, not 4),
        with S_t = sum_{i+j=t} U_i * K_j (complex, scrambled layout)."""
        wr = wi = None
        for t_ in (t, t + 1):
            if t_ >= m:
                break
            imag = t_ != t  # S_{t+1} rides the imaginary slot
            for i in range(t_ + 1):
                ur, ui = us[i]
                kr = kr_ref[t_ - i]
                ki = ki_ref[t_ - i]
                pr = ur * kr - ui * ki
                pi = ur * ki + ui * kr
                ar, ai = (-pi, pr) if imag else (pr, pi)
                wr = ar if wr is None else wr + ar
                wi = ai if wi is None else wi + ai
        return wr, wi

    bias = bias_ref[...]

    def store(t, y_t, y_prev):
        """out block t = head(inv S_t) + tail(inv S_{t-1}) + bias * u_t."""
        y = y_t[:, :h]
        if y_prev is not None:
            y = y + y_prev[:, h:]
        y = y + u_ref[0, :, t * h : (t + 1) * h].astype(jnp.float32) * bias
        out_ref[0, :, t * h : (t + 1) * h] = y.astype(out_ref.dtype)

    y_prev = None
    for t in range(0, m, 2):
        wr, wi = spectrum_pair(t)
        # both S inverses are real (spectra of real signals), so one complex
        # inverse returns them as (re, im)
        yr, yi = _cidft(wr, wi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)
        store(t, yr, y_prev)
        if t + 1 < m:
            store(t + 1, yi, yr)
        y_prev = yi


def _short_conv_vmem(x, wb, L: int):
    """Causal W-tap depthwise conv of a (bc, L) VMEM block.

    wb: (bc, W+1) — taps w[0..W-1] plus the channel bias in the last
    column (packed to halve the kernel's input-ref count).
    """
    w = wb.shape[1] - 1
    xpad = jnp.pad(x, ((0, 0), (w - 1, 0)))
    out = wb[:, w - 1 : w] * x + wb[:, w : w + 1]
    for s in range(w - 1):
        out = out + wb[:, s : s + 1] * xpad[:, s : s + L]
    return out


def _dft_conv_block_mixer_kernel(
    x0_ref, x1_ref, v_ref, wb0_ref, wb1_ref, wbv_ref, kbias_ref,
    kr_ref, ki_ref, f1r_ref, f1i_ref, twTr_ref, twTi_ref, f2r_ref, f2i_ref,
    out_ref, z_ref=None,
    *, n: int, n1: int, n2: int, bc: int, L: int, m: int,
):
    """Whole order-2 Hyena mixer core fused around the m-block conv.

    Per (channel-block, batch-row) grid cell: short depthwise conv of the
    three projection groups (x0, x1, v) in VMEM, gate g = v_c * x1_c, the
    m-block long conv of g (same structure as ``_dft_conv_block_kernel``),
    filter-bias passthrough, and the output gate y_t * x0_c — everything
    between ``in_proj`` and ``out_proj`` in one kernel.  The XLA-level
    short conv alone measured ~19 ms per 262k-token batch (elementwise
    passes over the (B, 3D, L) tensor); here it is VPU work on
    VMEM-resident blocks.
    """
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twTr, twTi = twTr_ref[...], twTi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]
    h = n // 2

    x1c = _short_conv_vmem(x1_ref[0].astype(jnp.float32), wb1_ref[...], L)
    vc = _short_conv_vmem(v_ref[0].astype(jnp.float32), wbv_ref[...], L)
    g = vc * x1c

    us = []
    for p in range(0, m - 1, 2):
        b0 = jnp.pad(g[:, p * h : (p + 1) * h], ((0, 0), (0, n - h)))
        b1 = jnp.pad(g[:, (p + 1) * h : (p + 2) * h], ((0, 0), (0, n - h)))
        s0, s1 = _packed_fwd2(b0, b1, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)
        us += [s0, s1]
    if m % 2:
        b = jnp.pad(g[:, (m - 1) * h :], ((0, 0), (0, n - h))).reshape(bc, n1, n2)
        us.append(_fwd_dft(b, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc))

    def spectrum_pair(t):
        wr = wi = None
        for t_ in (t, t + 1):
            if t_ >= m:
                break
            imag = t_ != t
            for i in range(t_ + 1):
                ur, ui = us[i]
                kr = kr_ref[t_ - i]
                ki = ki_ref[t_ - i]
                pr = ur * kr - ui * ki
                pi = ur * ki + ui * kr
                ar, ai = (-pi, pr) if imag else (pr, pi)
                wr = ar if wr is None else wr + ar
                wi = ai if wi is None else wi + ai
        return wr, wi

    x0c = _short_conv_vmem(x0_ref[0].astype(jnp.float32), wb0_ref[...], L)
    kbias = kbias_ref[...]

    def store(t, y_t, y_prev):
        y = y_t[:, :h]
        if y_prev is not None:
            y = y + y_prev[:, h:]
        y = y + g[:, t * h : (t + 1) * h] * kbias
        if z_ref is not None:
            # pre-gate conv output: the training VJP's z residual (saves a
            # whole conv rematerialization in the backward)
            z_ref[0, :, t * h : (t + 1) * h] = y.astype(z_ref.dtype)
        y = y * x0c[:, t * h : (t + 1) * h]
        out_ref[0, :, t * h : (t + 1) * h] = y.astype(out_ref.dtype)

    y_prev = None
    for t in range(0, m, 2):
        wr, wi = spectrum_pair(t)
        yr, yi = _cidft(wr, wi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)
        store(t, yr, y_prev)
        if t + 1 < m:
            store(t + 1, yi, yr)
        y_prev = yi


def mixer_conv_fused(uc3, short_weight, short_bias, filter_bias, kspec,
                     h: int | None = None, interpret: bool = False,
                     return_z: bool = False):
    """Fused order-2 Hyena mixer core: (B, 3D, L) projections -> (B, D, L).

    uc3: ``in_proj`` output in channel-major layout, groups [x0, x1, v]
    (RAW — the short conv runs inside the kernel).  short_weight: (3D, 1, W)
    torch-layout depthwise taps; short_bias: (3D,); filter_bias: (D,) the
    Hyena filter passthrough gain; kspec: ``block_filter_spectra`` of the
    implicit filter (cached per bucket by the engine).

    Computes y = shortconv(x0) * conv(shortconv(v) * shortconv(x1), k)
    with the m-block DFT conv; equals the unfused
    short_depthwise_conv -> gate -> fft_conv -> gate composition.
    """
    B, C3, L = uc3.shape
    D = C3 // 3
    h = h or BLOCK_H or _choose_block_h(D, L, interpret)
    g = _block_geometry(L, h, interpret)
    if g is None:
        raise ValueError(f"mixer_conv_fused: L={L} has no block geometry at h={h}")
    m, n, n1, n2 = g
    bc = _pick_bc_block(n, D, m, interpret)
    if bc is None:
        raise ValueError(f"mixer_conv_fused: no VMEM-fitting bc for n={n}, m={m}")
    _n1, _n2, *consts = _constants(n)
    kr, ki = kspec
    if kr.shape != (m, D, n1, n2):
        raise ValueError(f"mixer_conv_fused: kspec shape {kr.shape} != {(m, D, n1, n2)}")

    w = short_weight.shape[-1]
    # pack taps + bias per channel group: (3, D, W+1)
    wb = jnp.concatenate(
        [short_weight[:, 0, :], short_bias[:, None]], axis=-1
    ).astype(jnp.float32).reshape(3, D, w + 1)

    kernel = functools.partial(
        _dft_conv_block_mixer_kernel, n=n, n1=n1, n2=n2, bc=bc, L=L, m=m
    )
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda c, b: (0, 0), memory_space=pltpu.VMEM
    )
    nb = D // bc  # channel blocks per group
    group_spec = lambda gi: pl.BlockSpec(  # noqa: E731
        (1, bc, L), lambda c, b, gi=gi: (b, gi * nb + c, 0), memory_space=pltpu.VMEM
    )
    wb_spec = pl.BlockSpec((bc, w + 1), lambda c, b: (c, 0), memory_space=pltpu.VMEM)
    kspec_spec = pl.BlockSpec((m, bc, n1, n2), lambda c, b: (0, c, 0, 0), memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((1, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, D, L), uc3.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape) if return_z else out_shape,
        grid=(nb, B),
        in_specs=[
            group_spec(0), group_spec(1), group_spec(2),
            wb_spec, wb_spec, wb_spec,
            pl.BlockSpec((bc, 1), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
            kspec_spec, kspec_spec,
            const_spec((n1, n1)), const_spec((n1, n1)),
            const_spec((n2, n1)), const_spec((n2, n1)),
            const_spec((n2, n2)), const_spec((n2, n2)),
        ],
        out_specs=(io_spec, io_spec) if return_z else io_spec,
        **({"interpret": True} if interpret else {}),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=_PASSES.get(_PREC, 3) * 8 * (n1 + n2) * ((m + 1) // 2) * 2 * B * D * n // m,
            bytes_accessed=(4 * B * D * L + 2 * D * L) * 4,
            transcendentals=0,
        ),
    )(
        # uc3 passed once per channel group — each spec windows its group
        uc3, uc3, uc3, wb[0], wb[1], wb[2],
        filter_bias.astype(jnp.float32).reshape(D, 1),
        kr, ki,
        *(jnp.asarray(c) for c in consts),
    )
    return out


def _dft_conv_pair_mixer_kernel(
    x0_ref, x1_ref, v_ref, wb0_ref, wb1_ref, wbv_ref, kbias_ref,
    kr_ref, ki_ref, f1r_ref, f1i_ref, twTr_ref, twTi_ref, f2r_ref, f2i_ref,
    out_ref, z_ref=None,
    *, n: int, n1: int, n2: int, bc: int, L: int,
):
    """Order-2 Hyena mixer core fused around the batch-pair direct conv.

    The direct-kernel counterpart of ``_dft_conv_block_mixer_kernel`` for
    the small/mid length buckets (block-mixer floor is L = _MIN_BLOCK_L =
    12288): short
    depthwise conv of the three projection groups, gate g = v_c * x1_c,
    the TWO batch rows' gates packed into ONE complex DFT (conv is linear,
    filter shared), pointwise product with the precomputed filter spectrum,
    complex inverse (both rows come back as re/im), filter-bias
    passthrough, output gate y * x0_c.  Serves the buckets below the block
    mixer's floor (_MIN_BLOCK_L = 12288).  The XLA-level short conv +
    gating this replaces measured ~19 ms per 262k-token batch.
    """
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twTr, twTi = twTr_ref[...], twTi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]

    wb1 = wb1_ref[...]
    wbv = wbv_ref[...]
    g0 = (_short_conv_vmem(v_ref[0].astype(jnp.float32), wbv, L)
          * _short_conv_vmem(x1_ref[0].astype(jnp.float32), wb1, L))
    g1 = (_short_conv_vmem(v_ref[1].astype(jnp.float32), wbv, L)
          * _short_conv_vmem(x1_ref[1].astype(jnp.float32), wb1, L))

    xr = jnp.pad(g0, ((0, 0), (0, n - L))).reshape(bc, n1, n2)
    xi = jnp.pad(g1, ((0, 0), (0, n - L))).reshape(bc, n1, n2)
    zr, zi = _cdft(xr, xi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)

    kr = kr_ref[...]
    ki = ki_ref[...]
    pr = zr * kr - zi * ki
    pi = zr * ki + zi * kr

    yr, yi = _cidft(pr, pi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)

    wb0 = wb0_ref[...]
    kbias = kbias_ref[...]
    x0c0 = _short_conv_vmem(x0_ref[0].astype(jnp.float32), wb0, L)
    x0c1 = _short_conv_vmem(x0_ref[1].astype(jnp.float32), wb0, L)
    z0 = yr[:, :L] + g0 * kbias
    z1 = yi[:, :L] + g1 * kbias
    if z_ref is not None:
        z_ref[0] = z0.astype(z_ref.dtype)
        z_ref[1] = z1.astype(z_ref.dtype)
    out_ref[0] = (z0 * x0c0).astype(out_ref.dtype)
    out_ref[1] = (z1 * x0c1).astype(out_ref.dtype)


def mixer_fused_direct_available(D: int, L: int, B: int, interpret: bool = False) -> bool:
    """True when ``mixer_conv_fused_direct`` covers (D, L, B) on this backend.

    Requires an even row count (two gates per complex DFT) and a legal
    pair-kernel geometry at n = next-pow2(2L); the block-mixer route takes
    over at L >= _MIN_BLOCK_L (12288) where its shared forward DFTs win."""
    if B % 2:
        return False
    if not interpret and jax.default_backend() != "tpu":
        # the non-interpret Pallas kernel only lowers on TPU (mirrors
        # mixer_fused_available's backend gate)
        return False
    n = 1
    while n < 2 * L:
        n <<= 1
    if not interpret and jax.default_backend() == "tpu":
        n1, n2 = _factor(n)
        if not (n1 >= 64 and n1 % 8 == 0 and n2 % 128 == 0):
            return False
    return _pick_bc(n, D, interpret, "pair_mixer") is not None


def direct_filter_spectra(k: jnp.ndarray, n: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scrambled spectrum of the (D, L) filter at fft size n, scaled 1/n.

    Computed outside the kernel as XLA matmuls (once per length bucket at
    inference — ``PredictEngine`` caches it like the block spectra)."""
    D, L = k.shape
    n1, n2, *consts = _constants(n)
    f1r, f1i, twTr, twTi, f2r, f2i = (jnp.asarray(c) for c in consts)
    k3 = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, n - L))).reshape(D, n1, n2)
    kr, ki = _fwd_dft(k3, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, D)
    return kr / n, ki / n


def mixer_conv_fused_direct(uc3, short_weight, short_bias, filter_bias, kspec,
                            fft_size: int, interpret: bool = False,
                            return_z: bool = False):
    """Fused order-2 mixer core over the batch-pair direct conv kernel.

    Same contract as ``mixer_conv_fused`` (uc3 = raw in_proj output in
    channel-major [x0, x1, v] group layout -> (B, D, L)) for the buckets
    below the block kernel's floor; ``kspec`` is
    ``direct_filter_spectra(k, fft_size)``.  B must be even.
    """
    B, C3, L = uc3.shape
    D = C3 // 3
    n = fft_size
    if B % 2:
        raise ValueError(f"mixer_conv_fused_direct: B={B} must be even (pair packing)")
    bc = _pick_bc(n, D, interpret, "pair_mixer")
    if bc is None:
        raise ValueError(f"mixer_conv_fused_direct: no VMEM-fitting bc for n={n}, D={D}")
    n1, n2, *consts = _constants(n)
    kr, ki = kspec
    if kr.shape != (D, n1, n2):
        raise ValueError(f"mixer_conv_fused_direct: kspec shape {kr.shape} != {(D, n1, n2)}")

    w = short_weight.shape[-1]
    wb = jnp.concatenate(
        [short_weight[:, 0, :], short_bias[:, None]], axis=-1
    ).astype(jnp.float32).reshape(3, D, w + 1)

    kernel = functools.partial(
        _dft_conv_pair_mixer_kernel, n=n, n1=n1, n2=n2, bc=bc, L=L
    )
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda c, b: (0, 0), memory_space=pltpu.VMEM
    )
    nb = D // bc
    group_spec = lambda gi: pl.BlockSpec(  # noqa: E731
        (2, bc, L), lambda c, b, gi=gi: (b, gi * nb + c, 0), memory_space=pltpu.VMEM
    )
    wb_spec = pl.BlockSpec((bc, w + 1), lambda c, b: (c, 0), memory_space=pltpu.VMEM)
    kspec_spec = pl.BlockSpec((bc, n1, n2), lambda c, b: (c, 0, 0), memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((2, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, D, L), uc3.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape) if return_z else out_shape,
        grid=(nb, B // 2),
        in_specs=[
            group_spec(0), group_spec(1), group_spec(2),
            wb_spec, wb_spec, wb_spec,
            pl.BlockSpec((bc, 1), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
            kspec_spec, kspec_spec,
            const_spec((n1, n1)), const_spec((n1, n1)),
            const_spec((n2, n1)), const_spec((n2, n1)),
            const_spec((n2, n2)), const_spec((n2, n2)),
        ],
        out_specs=(io_spec, io_spec) if return_z else io_spec,
        **({"interpret": True} if interpret else {}),
        # headroom above the 16M default (the live model sits near it at
        # n = 16384); v5e has 128M VMEM/core
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=_PASSES.get(_PREC, 3) * 8 * (n1 + n2) * B * D * n,
            bytes_accessed=(4 * B * D * L + 2 * D * n) * 4,
            transcendentals=0,
        ),
    )(
        uc3, uc3, uc3, wb[0], wb[1], wb[2],
        filter_bias.astype(jnp.float32).reshape(D, 1),
        kr, ki,
        *(jnp.asarray(c) for c in consts),
    )
    return out


#: candidate block sizes of the m-block kernel, largest first.  h = 8192
#: (block fft n = 16384 = 128 x 128) is the cheapest-per-transform geometry
#: on TPU (the pair kernel's sweet spot) but only fits scoped VMEM up to
#: m = 2; h = 4096 (n = 8192 = 64 x 128, still legal) covers larger m.
BLOCK_HS = (8192, 4096)
#: default block size (tests override); None = auto-select per L
BLOCK_H = None


def _block_geometry(L: int, h: int, interpret: bool = False):
    """(m, n, n1, n2) of the m-block kernel, or None if L doesn't fit it."""
    if h is None or h <= 0 or L % h or L < 2 * h:
        return None
    m = L // h
    n = 2 * h
    n1, n2 = _factor(n)
    if not interpret and jax.default_backend() == "tpu":
        if not (n1 >= 64 and n1 % 8 == 0 and n2 % 128 == 0):
            return None
    return m, n, n1, n2


def _pick_bc_block(n: int, D: int, m: int, interpret: bool = False) -> int | None:
    """Channel block for the m-block kernel.

    Live-VMEM model anchored to measured Mosaic stack peaks (compile error
    reports at bc = 8): m = 4/n = 16384 -> 17.9M, m = 8/n = 8192 -> 19.7M.
    (6m + 30) (bc, n) f32 units upper-bounds both (2m u-spectra + 2m
    filter-spectra windows + stage intermediates + allocator padding),
    checked against the raised 48M scoped limit with 4M headroom."""
    if interpret or jax.default_backend() != "tpu":
        return next((bc for bc in (16, 8, 4, 2, 1) if D % bc == 0), 1)
    live = 6 * m + 30
    for bc in (32, 24, 16, 8):
        if D % bc == 0 and bc * n * 4 * live <= 44 * 1024 * 1024:
            return bc
    return None


def _choose_block_h(D: int, L: int, interpret: bool = False) -> int | None:
    """Largest candidate h whose geometry is legal AND fits scoped VMEM."""
    for h in BLOCK_HS:
        g = _block_geometry(L, h, interpret)
        if g is None:
            continue
        m, n, _n1, _n2 = g
        if _pick_bc_block(n, D, m, interpret) is not None:
            return h
    return None


def supported_block(D: int, L: int, h: int | None = None, interpret: bool = False) -> bool:
    """True when the m-block kernel covers (D, L) on this backend."""
    h = h or BLOCK_H or _choose_block_h(D, L, interpret)
    g = _block_geometry(L, h, interpret)
    if g is None:
        return False
    m, n, _n1, _n2 = g
    return _pick_bc_block(n, D, m, interpret) is not None


def block_filter_spectra(k: jnp.ndarray, h: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scrambled block spectra of the (D, L) filter, scaled by 1/n.

    Computed OUTSIDE the kernel as plain jnp (XLA matmuls), like
    ``half_filter_spectrum``: in-kernel filter DFTs cost 2m VMEM scratch
    buffers plus the pl.when compute branch, which blows the 16M scoped
    limit at m >= 4 (measured).  Returns (kr, ki) of shape
    (m, D, n1, n2) ready for the kernel's pointwise products.
    """
    D, L = k.shape
    m = L // h
    n = 2 * h
    n1, n2, *consts = _constants(n)
    f1r, f1i, twTr, twTi, f2r, f2i = (jnp.asarray(c) for c in consts)
    k32 = k.astype(jnp.float32)
    specs = []
    for t in range(m):
        blk = jnp.pad(k32[:, t * h : (t + 1) * h], ((0, 0), (0, n - h)))
        specs.append(
            _fwd_dft(blk.reshape(D, n1, n2), f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, D)
        )
    kr = jnp.stack([s[0] for s in specs]) / n
    ki = jnp.stack([s[1] for s in specs]) / n
    return kr, ki


def dft_conv_pallas_block(u, k, bias, h: int | None = None, interpret: bool = False,
                          kspec: tuple | None = None):
    """Causal linear conv via the m-block fused kernel (see the kernel doc).

    u: (B, D, L) with L = m*h; k: (D, L) float32; bias: (D,).  Same output
    contract as ``fft_conv_matmul(u, k, bias, next_pow2(2L))``.

    ``kspec``: precomputed ``block_filter_spectra(k, h)`` — at inference the
    filter is frozen per length bucket, so the engine computes the spectra
    once per bucket and passes them in, removing the m*D filter DFTs from
    every batch forward (~1/B of the conv's transform work).
    """
    B, D, L = u.shape
    h = h or BLOCK_H or _choose_block_h(D, L, interpret)
    g = _block_geometry(L, h, interpret)
    if g is None:
        raise ValueError(f"dft_conv_pallas_block: L={L} is not a >=2 multiple of h={h}")
    m, n, n1, n2 = g
    bc = _pick_bc_block(n, D, m, interpret)
    if bc is None:
        raise ValueError(f"dft_conv_pallas_block: no VMEM-fitting bc for n={n}, m={m}")
    _n1, _n2, *consts = _constants(n)
    kr, ki = kspec if kspec is not None else block_filter_spectra(k, h)
    if kr.shape != (m, D, n1, n2):
        raise ValueError(
            f"dft_conv_pallas_block: kspec shape {kr.shape} != {(m, D, n1, n2)} "
            "(filter-spectra cache computed for a different geometry)"
        )

    kernel = functools.partial(
        _dft_conv_block_kernel, n=n, n1=n1, n2=n2, bc=bc, L=L, m=m
    )
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda c, b: (0, 0), memory_space=pltpu.VMEM
    )
    kspec = pl.BlockSpec((m, bc, n1, n2), lambda c, b: (0, c, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D, L), u.dtype),
        grid=(D // bc, B),
        in_specs=[
            pl.BlockSpec((1, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM),
            kspec,
            kspec,
            pl.BlockSpec((bc, 1), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
            const_spec((n1, n1)), const_spec((n1, n1)),
            const_spec((n2, n1)), const_spec((n2, n1)),
            const_spec((n2, n2)), const_spec((n2, n2)),
        ],
        out_specs=pl.BlockSpec((1, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM),
        **({"interpret": True} if interpret else {}),
        # the m-block kernel legitimately holds 2m block spectra live (u + k)
        # plus inverse-stage intermediates: ~18-20M at m = 4/8 — raise the
        # Mosaic scoped-VMEM limit above its conservative 16M default
        # (v5e has 128M VMEM/core; 48M leaves ample window double-buffering)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            # ceil(m/2) packed fwd + ceil(m/2) packed inv, 8 stage dots each
            flops=_PASSES.get(_PREC, 3) * 8 * (n1 + n2) * ((m + 1) // 2) * 2 * B * D * n // m,
            bytes_accessed=(2 * B * D * L + 2 * D * L) * 4,
            transcendentals=0,
        ),
    )(
        u, kr, ki, bias.astype(jnp.float32).reshape(D, 1),
        *(jnp.asarray(c) for c in consts),
    )
    return out


@functools.lru_cache(maxsize=None)
def _half_constants(n: int):
    """Constants for the half-complex (rfft-style) kernel.

    The length-n real DFT runs as a length-nh = n/2 complex DFT of
    z[m] = u[2m] + i*u[2m+1], factored nh = m1*m2 by ``_half_geometry``
    (m2 a lane multiple, m1 <= 128 — the empirical Mosaic compile bound).
    Returns stage matrices, the half-transform twiddle in (t, k1) layout,
    and the reconstruction twiddle W_n^k = exp(-2i pi (k1 + m1 k2)/n) as an
    (m1, m2) grid.
    """
    m1, m2 = _half_geometry(n)
    nh = n // 2
    a1 = -2.0 * np.pi * np.outer(np.arange(m1), np.arange(m1)) / m1
    a2 = -2.0 * np.pi * np.outer(np.arange(m2), np.arange(m2)) / m2
    at = -2.0 * np.pi * np.outer(np.arange(m2), np.arange(m1)) / nh  # (t, k1)
    kgrid = np.arange(m1)[:, None] + m1 * np.arange(m2)[None, :]      # (k1, k2)
    aw = -2.0 * np.pi * kgrid / n
    f = np.float32
    return (
        m1, m2,
        np.cos(a1).astype(f), np.sin(a1).astype(f),
        np.cos(at).astype(f), np.sin(at).astype(f),
        np.cos(a2).astype(f), np.sin(a2).astype(f),
        np.cos(aw).astype(f), np.sin(aw).astype(f),
    )


def _half_fwd(u, f1r, f1i, twr, twi, f2r, f2i, wr, wi, n, m1, m2, bc, L):
    """(bc, L) real, zero-padded to n -> packed half spectrum.

    Returns (Xr, Xi, X_nyq): X[k] for k = 0..nh-1 as (bc, m1, m2) scrambled
    grids (k = k1 + m1*k2) plus the Nyquist term X[nh] per row (bc, 1, 1).
    The conjugate-flip spectrum is obtained as DFT(conj(z)) — stage-1
    products are shared, no (unsupported) lax.rev needed.
    """
    x = jnp.pad(u, ((0, 0), (0, n - L))).reshape(bc, m1, 2 * m2)
    xs = jnp.swapaxes(x, 1, 2).reshape(bc, m2, 2, m1)
    zr = xs[:, :, 0, :].reshape(bc * m2, m1)
    zi = xs[:, :, 1, :].reshape(bc * m2, m1)
    p1 = _dot_h(zr, f1r); p2 = _dot_h(zr, f1i)
    p3 = _dot_h(zi, f1r); p4 = _dot_h(zi, f1i)
    # Z = DFT(z), Zf = DFT(conj z) share the four stage-1 products
    def stage2(br, bi):
        cr = (br.reshape(bc, m2, m1) * twr[None] - bi.reshape(bc, m2, m1) * twi[None])
        ci = (br.reshape(bc, m2, m1) * twi[None] + bi.reshape(bc, m2, m1) * twr[None])
        cr = jnp.swapaxes(cr, 1, 2).reshape(bc * m1, m2)
        ci = jnp.swapaxes(ci, 1, 2).reshape(bc * m1, m2)
        dr = (_dot_h(cr, f2r) - _dot_h(ci, f2i)).reshape(bc, m1, m2)
        di = (_dot_h(cr, f2i) + _dot_h(ci, f2r)).reshape(bc, m1, m2)
        return dr, di
    zr2, zi2 = stage2(p1 - p4, p2 + p3)       # Z
    zfr, zfi = stage2(p1 + p4, p2 - p3)       # Zf = conj(Z[(nh-k) % nh])
    dr = zr2 - zfr
    di = zi2 - zfi
    xr_s = 0.5 * (zr2 + zfr) + 0.5 * (wr[None] * di + wi[None] * dr)
    xi_s = 0.5 * (zi2 + zfi) - 0.5 * (wr[None] * dr - wi[None] * di)
    # Nyquist term X[nh] = Re Z[0] - Im Z[0], kept as a grid that is zero
    # everywhere except (0,0) — Mosaic rejects scalar-slice broadcasts, so
    # all downstream uses stay elementwise at the (0,0) slot.
    mask00 = (jax.lax.broadcasted_iota(jnp.int32, (bc, m1, m2), 1)
              + jax.lax.broadcasted_iota(jnp.int32, (bc, m1, m2), 2)) == 0
    x_nyq = jnp.where(mask00, zr2 - zi2, 0.0)
    return xr_s, xi_s, x_nyq, mask00


def half_filter_spectrum(k: jnp.ndarray, fft_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Packed half spectrum of the (D, L) filter, scaled by 1/n.

    Computed OUTSIDE the kernel as plain jnp (XLA matmuls), once per
    forward: combining the filter transform with the inverse path inside
    one Mosaic kernel crashes the TPU compiler (a ``pl.when``-around-
    scratch-write + inverse-stage interaction, bisected empirically), and
    hoisting it is also structurally better — no per-grid-cell recompute,
    no VMEM scratch, and XLA shares it across the batch dimension for free.
    K[nh]/n rides in the (0,0) imag slot (K[0] is real, so the slot is free).
    """
    n = fft_size
    m1, m2, *consts = _half_constants(n)
    cj = [jnp.asarray(c) for c in consts]
    D, L = k.shape
    kr_s, ki_s, k_nyq, mask00 = _half_fwd(
        k.astype(jnp.float32), *cj, n, m1, m2, D, L)
    return kr_s / n, jnp.where(mask00, k_nyq / n, ki_s / n)


def _dft_conv_half_kernel(
    u_ref, kr_ref, ki_ref, bias_ref, f1r_ref, f1i_ref, twr_ref, twi_ref, f2r_ref, f2i_ref,
    wr_ref, wi_ref, out_ref,
    *, n: int, m1: int, m2: int, bc: int, L: int, part: str = "head",
):
    """Half-complex fused conv: all DFT buffers are (bc, nh) — half the
    real-signal kernel's footprint — which is what fits the 32k bucket
    (n = 65536) into the 16M VMEM scope.  The filter spectrum arrives
    precomputed/packed (``half_filter_spectrum``).  Math validated against
    np.fft: y_even = 2*Re(S) + delta, y_odd = 2*Re(T) - 2*P0 - delta with
    S = conjDFT(P), T = conjDFT(Winv * P), delta = P_nyq - P0."""
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]
    wr, wi = wr_ref[...], wi_ref[...]

    u = u_ref[0].astype(jnp.float32)
    xr_s, xi_s, x_nyq, mask00 = _half_fwd(
        u, f1r, f1i, twr, twi, f2r, f2i, wr, wi, n, m1, m2, bc, L)

    kr = kr_ref[...]
    ki_packed = ki_ref[...]
    ki = jnp.where(mask00, 0.0, ki_packed)

    pr = xr_s * kr - xi_s * ki
    pi = jnp.where(mask00, 0.0, xr_s * ki + xi_s * kr)
    # P_nyq as a (0,0)-only grid: x_nyq is zero off-slot, kspec_i's slot
    # holds K[nh]/n
    p_nyq = x_nyq * ki_packed

    # Rank-1 corrections folded into the (0,0) spectrum slot BEFORE the
    # inverse transforms (conjDFT(P + a*e0)[m] = conjDFT(P)[m] + a):
    #   y_even = 2 Re conjDFT(P) + delta      -> P'(0,0)  = (P0 + P_nyq)/2
    #   y_odd  = 2 Re conjDFT(WinvP) - 2P0 - delta -> B'(0,0) = (P0 - P_nyq)/2
    # with delta = P_nyq - P0 and WinvP(0,0) = P0.
    pr_s = jnp.where(mask00, 0.5 * (pr + p_nyq), pr)
    # B = Winv * P with Winv = conj(W)
    br = wr[None] * pr + wi[None] * pi
    bi = wr[None] * pi - wi[None] * pr
    br = jnp.where(mask00, 0.5 * (pr - p_nyq), br)

    def inv_real(ar, ai):
        # conjDFT (+ sign), real part only
        ar2 = ar.reshape(bc * m1, m2)
        ai2 = ai.reshape(bc * m1, m2)
        qr = (_dot_h(ar2, f2r) + _dot_h(ai2, f2i)).reshape(bc, m1, m2)
        qi = (_dot_h(ai2, f2r) - _dot_h(ar2, f2i)).reshape(bc, m1, m2)
        tbr = jnp.swapaxes(twr, 0, 1)[None]
        tbi = -jnp.swapaxes(twi, 0, 1)[None]
        rr = qr * tbr - qi * tbi
        ri = qr * tbi + qi * tbr
        rr2 = jnp.swapaxes(rr, 1, 2).reshape(bc * m2, m1)
        ri2 = jnp.swapaxes(ri, 1, 2).reshape(bc * m2, m1)
        return (_dot_h(rr2, f1r) + _dot_h(ri2, f1i)).reshape(bc, m2, m1)

    se = inv_real(pr_s, pi)
    te = inv_real(br, bi)
    y_even = 2.0 * se
    y_odd = 2.0 * te

    y = jnp.stack([y_even, y_odd], axis=2).reshape(bc, 2 * m2, m1)
    yfull = jnp.swapaxes(y, 1, 2).reshape(bc, n)
    if part == "full":
        out_ref[0] = (yfull + jnp.pad(u * bias_ref[...], ((0, 0), (0, n - L)))).astype(out_ref.dtype)
    else:
        y = yfull[:, L:] if part == "tail" else yfull[:, :L]
        out_ref[0] = (y + u * bias_ref[...]).astype(out_ref.dtype)


#: live-VMEM model per kernel, in (bc, n) f32 buffer equivalents.  Measured:
#: real 25.04M at bc=8/n=65536, pair 20.43M at bc=32/n=8192; half-kernel
#: buffers are (bc, n/2) so its coefficient is naturally ~half the real one.
#: pair_mixer = the bare pair kernel plus the three short-conved f32 group
#: copies and their pads; corr = u/g pads + packed-fwd products + U/G + P +
#: inverse intermediates.
_VMEM_LIVE = {"real": 12.5, "pair": 20.5, "half": 7.0, "pair_mixer": 27.0, "corr": 18.0}


def _pick_bc(n: int, D: int, interpret: bool = False, kind: str = "real") -> int | None:
    """Channel block: Mosaic needs the block's 2nd-to-last dim to be a
    multiple of 8, and the kernel must fit the 16M scoped-VMEM limit.
    Largest fitting multiple of 8 wins; None = does not fit (caller falls
    back to the next-cheapest kernel, then the einsum path).  Interpret
    mode / non-TPU backends (CPU tests, including the patched-
    ``pallas_call`` path) have neither constraint.
    """
    if interpret or jax.default_backend() != "tpu":
        return next((bc for bc in (16, 8, 4, 2, 1) if D % bc == 0), 1)
    live = _VMEM_LIVE[kind]
    # half kernel: bc = 8 (one f32 sublane tile) is the only block Mosaic
    # compiles — the even/odd packing reshape (bc, m1, 2*m2) -> (bc, m2, 2,
    # m1) crashes the compiler at bc in {16, 24, 32} (bisected on TPU).
    for bc in ((8,) if kind == "half" else (32, 24, 16, 8)):
        if D % bc == 0 and bc * n * 4 * live <= 15 * 1024 * 1024:
            return bc
    return None


def _half_geometry(n: int) -> tuple[int, int] | None:
    """nh = m1 * m2 with m2 = 128 lanes and m1 <= 128: Mosaic crashes on
    both m1 = 256 and m2 = 256 (bisected at n = 65536 on TPU), so the half
    kernel covers n <= 32768 — the 32k bucket (n = 65536) falls back to the
    einsum path."""
    nh = n // 2
    if n % 2 or nh % 128:
        return None
    m1 = nh // 128
    if m1 < 8 or m1 > 128 or m1 % 8:
        return None
    return m1, 128


#: MXU passes per dot at each precision policy (bf16 3-pass vs native f32).
_PASSES = {"default": 1, "high": 3, "highest": 6}


def _select_kernel(n: int, D: int, B: int, interpret: bool = False):
    """Cheapest fitting kernel: (kind, bc) or None.

    Cost = per-row stage-matmul units x MXU passes for the kernel's dot
    policy (real/pair run at ``_PREC``, half at ``_PREC_HALF``).  Calibrated
    against a TPU shootout at 262k tokens/batch, D=256 (einsum ~38.6 ms):
    pair 10.8/8.7 ms at the 4k/8k buckets, real 16.1 ms at 16k (beats half's
    18.6 — HIGHEST doubles half's pass count), half 53 ms at 2k (m1 = 16
    starves the MXU, excluded below m1 = 32; einsum wins that bucket).
    """
    n1, n2 = _factor(n)
    legal_full = n1 >= 64 and n1 % 8 == 0 and n2 % 128 == 0
    w = _PASSES.get(_PREC, 3)
    wh = _PASSES.get(_PREC_HALF, 6)
    cands = []
    if legal_full:
        bc = _pick_bc(n, D, interpret, "real")
        if bc:
            cands.append((w * (4 * n1 + 8 * n2), "real", bc))
        if B % 2 == 0:
            bc = _pick_bc(n, D, interpret, "pair")
            if bc:
                cands.append((w * 4 * (n1 + n2), "pair", bc))
    geom = _half_geometry(n)
    if geom and geom[0] >= 32:
        bc = _pick_bc(n, D, interpret, "half")
        if bc:
            cands.append((wh * (4 * geom[0] + 8 * geom[1]), "half", bc))
    if not cands:
        return None
    _, kind, bc = min(cands)
    return kind, bc


def supported(n: int, D: int, L: int, B: int = 2) -> bool:
    # n >= 2L suffices: the kernels zero-pad u and k from L to n internally
    # (any n >= 2L-1 computes the same linear conv), so non-power-of-two
    # length buckets ride the same kernels at the next power-of-two fft.
    return n >= 2 * L and _select_kernel(n, D, B) is not None


def dft_conv_pallas(u: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray, fft_size: int,
                    interpret: bool = False, kind: str | None = None,
                    part: str = "head") -> jnp.ndarray:
    """Causal linear convolution via the fused kernel.

    u: (B, D, L); k: (D, L) float32; bias: (D,).  Same contract as
    ``matmul_fft.fft_conv_matmul`` (zero-padded linear conv + bias*u).
    ``kind`` forces a specific kernel ("real"/"pair"/"half") for tests.
    ``part`` selects the stored conv range: "head" = [0, L) (the causal
    default), "tail" = [L, 2L), "full" = [0, 2L) — tail/full feed the
    overlap-add composition (``fft_conv_pallas_oa``); the bias*u term
    stays aligned to u's positions, so pass a zero bias with them.
    """
    B, D, L = u.shape
    n = fft_size
    if part != "head" and n != 2 * L:
        raise ValueError(f"part={part!r} requires n == 2L (overlap-add geometry), got n={n}, L={L}")
    if kind is None:
        sel = _select_kernel(n, D, B, interpret=interpret)
        if sel is None:
            raise ValueError(f"dft_conv_pallas: no VMEM-fitting kernel for n={n}, D={D}")
        kind, bc = sel
    else:
        bc = _pick_bc(n, D, interpret=interpret, kind=kind)
        if bc is None:
            raise ValueError(f"dft_conv_pallas: kernel {kind} does not fit n={n}, D={D}")

    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda c, b: (0, 0), memory_space=pltpu.VMEM
    )
    if kind == "half":
        m1, m2, *consts = _half_constants(n)
        kernel = functools.partial(_dft_conv_half_kernel, n=n, m1=m1, m2=m2, bc=bc, L=L, part=part)
        rows = 1
        kr, ki = half_filter_spectrum(k, n)
        filter_inputs = (kr, ki)
        filter_specs = [
            pl.BlockSpec((bc, m1, m2), lambda c, b: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, m1, m2), lambda c, b: (c, 0, 0), memory_space=pltpu.VMEM),
        ]
        extra_specs = [
            const_spec((m1, m1)), const_spec((m1, m1)),
            const_spec((m2, m1)), const_spec((m2, m1)),
            const_spec((m2, m2)), const_spec((m2, m2)),
            const_spec((m1, m2)), const_spec((m1, m2)),
        ]
        scratch = []
        flops = (4 * m1 + 8 * m2) * B * D * n
    else:
        n1, n2, *consts = _constants(n)
        rows = 2 if kind == "pair" else 1
        kern = _dft_conv_pair_kernel if kind == "pair" else _dft_conv_kernel
        kernel = functools.partial(kern, n=n, n1=n1, n2=n2, bc=bc, L=L, part=part)
        filter_inputs = (k.astype(jnp.float32),)
        filter_specs = [
            pl.BlockSpec((bc, L), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
        ]
        extra_specs = [
            const_spec((n1, n1)), const_spec((n1, n1)),
            const_spec((n2, n1)), const_spec((n2, n1)),
            const_spec((n2, n2)), const_spec((n2, n2)),
        ]
        scratch = [pltpu.VMEM((bc, n1, n2), jnp.float32) for _ in range(2)]
        flops = (4 * (n1 + n2) if kind == "pair" else (4 * n1 + 8 * n2)) * B * D * n

    # batch innermost: filter spectrum cached per c-block
    grid = (D // bc, B // rows)
    Lout = n if part == "full" else L
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D, Lout), u.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM),
            *filter_specs,
            pl.BlockSpec((bc, 1), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((rows, bc, Lout), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        # only pass interpret when explicitly requested so tests can patch
        # pl.pallas_call with a partial(interpret=True) default
        **({"interpret": True} if interpret else {}),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * B * D * L + 2 * D * L) * 4,
            transcendentals=0,
        ),
    )(
        u, *filter_inputs, bias.astype(jnp.float32).reshape(D, 1),
        *(jnp.asarray(c) for c in consts),
    )
    return out


def supported_oa(n: int, D: int, L: int, B: int) -> bool:
    """Overlap-add route: n itself has no fitting kernel but n/2 does.

    Covers the 32k bucket (n = 65536): every direct kernel hits a Mosaic
    compile bound there (bisected — see _half_geometry/_pick_bc), but the
    conv splits exactly into four half-length sub-convs at the PROVEN
    n = 32768 geometry.
    """
    return (
        n == 2 * L and L % 2 == 0
        # probe at batch B — the batch the three sub-convs actually launch
        # with (they split u along L, not along batch)
        and supported(n // 2, D, L // 2, B)
        and not supported(n, D, L, B)
    )


def dft_conv_pallas_oa(u, k, bias, fft_size, interpret: bool = False):
    """Causal conv via overlap-add over half-length fused-kernel calls.

    With h = L/2, sub-convs at n' = n/2 compose exactly:
      y[t < h]    = full(u_lo * k_lo)[t]
      y[h + s]    = full(u_lo * k_lo)[h + s] + head(u_hi * k_lo)[s]
                    + head(u_lo * k_hi)[s]
    (the u_hi * k_hi term only lands at t >= 2h = L — fully truncated).
    Three kernel launches over B rows each = 1.5x the direct-kernel token
    load (the full-output first call covers both its head and tail — no
    recompute).
    """
    B, D, L = u.shape
    h = L // 2
    ns = fft_size // 2
    ul, uh = u[..., :h], u[..., h:]
    kl, kh = k[..., :h], k[..., h:]
    zb = jnp.zeros_like(bias)
    full0 = dft_conv_pallas(ul, kl, zb, ns, interpret=interpret, part="full")
    head_xl = dft_conv_pallas(uh, kl, zb, ns, interpret=interpret)
    head_xh = dft_conv_pallas(ul, kh, zb, ns, interpret=interpret)
    y_hi = full0[..., h:] + head_xl + head_xh
    y = jnp.concatenate([full0[..., :h], y_hi], axis=-1)
    return y + (u * bias[None, :, None]).astype(y.dtype)


#: kill switch for the m-block kernel (CHIMERALM_BLOCK_CONV=0 restores the
#: round-3 direct/overlap-add routing)
_BLOCK_ENABLED = os.environ.get("CHIMERALM_BLOCK_CONV", "1") != "0"

#: below this L the direct kernels win (batch-pair packing at n = 2L beats
#: the block decomposition's extra spectrum products)
_MIN_BLOCK_L = 12288


def _pallas_forward(u, k, bias, fft_size, kspec=None):
    B, D, L = u.shape
    # the m-block kernel shares forward DFTs across all sub-convs and runs
    # at the cheapest-per-transform block fft — measured faster than both
    # the direct real kernel (16k bucket) and the 3-call overlap-add (32k)
    if _BLOCK_ENABLED and L >= _MIN_BLOCK_L and supported_block(D, L):
        return dft_conv_pallas_block(u, k, bias, kspec=kspec)
    if supported(fft_size, D, L, B):
        return dft_conv_pallas(u, k, bias, fft_size)
    return dft_conv_pallas_oa(u, k, bias, fft_size)


#: fused-mixer floor: at L = 8192 the bare block conv loses to the direct
#: pair kernel (9.2 vs 6.1 ms), but folding the short conv + gating into
#: the kernel still nets out ahead (9.3 vs ~11.5 ms unfused total)
_MIN_FUSED_L = 8192


def mixer_fused_available(D: int, L: int) -> bool:
    """True when ``mixer_conv_fused`` covers (D, L) on this backend."""
    return (
        _BLOCK_ENABLED
        and jax.default_backend() == "tpu"
        and L >= _MIN_FUSED_L
        and supported_block(D, L)
    )


def block_spectra_for_length(k: jnp.ndarray, L: int) -> tuple | None:
    """Filter block spectra for the geometry ``_pallas_forward`` will choose.

    (kr, ki) matching ``dft_conv_pallas_block``'s auto-selected h for
    (D, L) on this backend, or None when the block kernel won't be used —
    the inference engine caches this per length bucket
    (``PredictEngine._bucket_filter_cache``)."""
    D = k.shape[0]
    if not (_BLOCK_ENABLED and L >= _MIN_FUSED_L and supported_block(D, L)):
        return None
    h = BLOCK_H or _choose_block_h(D, L)
    return block_filter_spectra(k, h)


# ---- training backward: fused correlation kernels --------------------------
#
# VJP math for y = causal_conv(u, k) + bias * u, cotangent g (B, D, L):
#
#   du[b,d,t] = sum_{s>=t} k[d,s-t] g[b,d,s] + bias[d] g[b,d,t]
#             = flip_L( causal_conv(flip_L(g), k) + bias * flip_L(g) )
#     -- EXACTLY the forward op on time-reversed g, so du rides the same
#        fused kernels (direct / overlap-add / m-block) untouched.
#
#   dk[d,s]   = sum_b sum_t u[b,d,t] g[b,d,t+s]        (s in [0, L))
#     -- a batch-summed causal cross-correlation; by the correlation
#        theorem its zero-padded circular form is ifft(conj(U) * G)[0:L]
#        (n >= 2L kills wrap-around: lags live in (-L, L)).  The kernels
#        below fuse both forward DFTs (u and g packed into ONE complex
#        transform via ``_packed_fwd2``), the conjugate product, and the
#        inverse in VMEM, accumulating over the batch grid dimension.
#
#   dbias[d]  = sum_b sum_t u[b,d,t] g[b,d,t]          (one XLA pass)


def _cidft_real(pr, pi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc):
    """Scrambled spectrum -> real part of the unnormalized inverse (bc, n).

    ``_cidft`` minus the imaginary output's two stage-B dots — for a lone
    real-signal spectrum there is nothing to pack into the imag slot."""
    pr2 = pr.reshape(bc * n1, n2)
    pi2 = pi.reshape(bc * n1, n2)
    qr = (_dot(pr2, f2r) + _dot(pi2, f2i)).reshape(bc, n1, n2)
    qi = (_dot(pi2, f2r) - _dot(pr2, f2i)).reshape(bc, n1, n2)
    tbr = jnp.swapaxes(twTr, 0, 1)[None]
    tbi = -jnp.swapaxes(twTi, 0, 1)[None]
    rr = qr * tbr - qi * tbi
    ri = qr * tbi + qi * tbr
    rr2 = jnp.swapaxes(rr, 1, 2).reshape(bc * n2, n1)
    ri2 = jnp.swapaxes(ri, 1, 2).reshape(bc * n2, n1)
    yr = (_dot(rr2, f1r) + _dot(ri2, f1i)).reshape(bc, n2, n1)
    return jnp.swapaxes(yr, 1, 2).reshape(bc, n1 * n2)


def _dft_corr_kernel(
    u_ref, g_ref, f1r_ref, f1i_ref, twTr_ref, twTi_ref, f2r_ref, f2i_ref,
    out_ref,
    *, n: int, n1: int, n2: int, bc: int, L: int,
):
    """Batch-summed causal correlation: out[c] += ifft(conj(U) * G)[0:L]/n.

    Grid (D/bc, B) with the out block a function of c only — the TPU grid
    runs b innermost, so the block stays VMEM-resident across the batch
    loop (init at b == 0, accumulate after)."""
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twTr, twTi = twTr_ref[...], twTi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]

    u = u_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    ub = jnp.pad(u, ((0, 0), (0, n - L)))
    gb = jnp.pad(g, ((0, 0), (0, n - L)))
    (ur, ui), (gr, gi) = _packed_fwd2(ub, gb, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)

    # P = conj(U) * G (spectrum of a real signal: the circular correlation)
    pr = ur * gr + ui * gi
    pi = ur * gi - ui * gr
    y = _cidft_real(pr, pi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)
    y = y[:, :L] * (1.0 / n)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += y


def _dft_corr_block_kernel(
    u_ref, g_ref, f1r_ref, f1i_ref, twTr_ref, twTi_ref, f2r_ref, f2i_ref,
    out_ref,
    *, n: int, n1: int, n2: int, bc: int, L: int, m: int,
):
    """m-block batch-summed correlation at block fft size n = 2h.

    Block pair (i, j) contributes at lags s = (j-i)h + lam, lam in (-h, h):
      C_t = sum_i conj(U_i) * G_{i+t}   (t = j - i = 0..m-1)
      dk block t = head(inv C_t) + tail(inv C_{t+1})
    (tail = the negative-lag half of the NEXT offset — the forward block
    conv's mirror image, where tail comes from the PREVIOUS offset).  All
    2m forward block DFTs are packed two-real-per-complex; C_t/C_{t+1}
    pairs share one complex inverse."""
    f1r, f1i = f1r_ref[...], f1i_ref[...]
    twTr, twTi = twTr_ref[...], twTi_ref[...]
    f2r, f2i = f2r_ref[...], f2i_ref[...]
    h = n // 2

    def blocks(ref):
        def blk(t):
            b = ref[0, :, t * h : (t + 1) * h].astype(jnp.float32)
            return jnp.pad(b, ((0, 0), (0, n - h)))

        specs = []
        for p in range(0, m - 1, 2):
            s0, s1 = _packed_fwd2(
                blk(p), blk(p + 1), f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc
            )
            specs += [s0, s1]
        if m % 2:
            b3 = blk(m - 1).reshape(bc, n1, n2)
            specs.append(_fwd_dft(b3, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc))
        return specs

    us = blocks(u_ref)
    gs = blocks(g_ref)

    def corr_pair(t):
        """W = C_t + i*C_{t+1}, C_t = sum_i conj(U_i) * G_{i+t}."""
        wr = wi = None
        for t_ in (t, t + 1):
            if t_ >= m:
                break
            imag = t_ != t
            for i in range(m - t_):
                ur, ui = us[i]
                gr, gi = gs[i + t_]
                pr = ur * gr + ui * gi
                pi = ur * gi - ui * gr
                ar, ai = (-pi, pr) if imag else (pr, pi)
                wr = ar if wr is None else wr + ar
                wi = ai if wi is None else wi + ai
        return wr, wi

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # block t needs inv C_{t+1} (forward dependency): store block t from the
    # current pair, hold the pair's imag inverse for block t+1's head
    pending = None  # inv C_{t} awaiting the next pair's tail
    for t in range(0, m, 2):
        wr, wi = corr_pair(t)
        yr, yi = _cidft(wr, wi, f1r, f1i, twTr, twTi, f2r, f2i, n1, n2, bc)
        if pending is not None:
            out_ref[:, (t - 1) * h : t * h] += (pending[:, :h] + yr[:, h:]) * (1.0 / n)
        if t + 1 < m:
            out_ref[:, t * h : (t + 1) * h] += (yr[:, :h] + yi[:, h:]) * (1.0 / n)
            pending = yi
        else:  # m odd: C_{m} = 0, no tail
            out_ref[:, t * h : (t + 1) * h] += yr[:, :h] * (1.0 / n)
            pending = None
    if pending is not None:  # m even: last block's tail is C_m = 0
        out_ref[:, (m - 1) * h :] += pending[:, :h] * (1.0 / n)


def _corr_geometry(D: int, L: int, B: int, interpret: bool = False):
    """Routing for ``dft_corr_pallas``: ("direct", n, bc) | ("block", h, bc) | None."""
    n = 2 * L
    if not interpret and jax.default_backend() == "tpu":
        n1, n2 = _factor(n)
        direct_legal = n1 >= 64 and n1 % 8 == 0 and n2 % 128 == 0
    else:
        direct_legal = True
    if L < _MIN_BLOCK_L and direct_legal:
        bc = _pick_bc(n, D, interpret, "corr")
        if bc is not None:
            return ("direct", n, bc)
    h = _choose_block_h(D, L, interpret)
    if h is not None:
        m, nb, _n1, _n2 = _block_geometry(L, h, interpret)
        bc = _pick_bc_block(nb, D, m, interpret)
        if bc is not None:
            return ("block", h, bc)
    if direct_legal:
        bc = _pick_bc(n, D, interpret, "corr")
        if bc is not None:
            return ("direct", n, bc)
    return None


def supported_corr(D: int, L: int, B: int, interpret: bool = False) -> bool:
    return _corr_geometry(D, L, B, interpret) is not None


def dft_corr_pallas(u, g, interpret: bool = False):
    """Batch-summed causal correlation dk[d,s] = sum_{b,t} u[b,d,t] g[b,d,t+s].

    u, g: (B, D, L); returns (D, L) float32 — the filter cotangent of the
    causal conv.  Routes to the direct packed kernel (one complex DFT
    carries both U and G) or the m-block variant (long L), mirroring the
    forward routing."""
    B, D, L = u.shape
    route = _corr_geometry(D, L, B, interpret)
    if route is None:
        raise ValueError(f"dft_corr_pallas: no VMEM-fitting kernel for D={D}, L={L}")
    kind, size, bc = route
    const_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda c, b: (0, 0), memory_space=pltpu.VMEM
    )
    if kind == "direct":
        n = size
        n1, n2, *consts = _constants(n)
        kernel = functools.partial(_dft_corr_kernel, n=n, n1=n1, n2=n2, bc=bc, L=L)
        # 14 stage dots (8 packed-fwd + 6 real inverse) vs the pair kernel's 8;
        # same _PASSES precision multiplier as every other kernel's estimate
        flops = _PASSES.get(_PREC, 3) * 7 * (n1 + n2) * B * D * n
        vmem_kw = {}
    else:
        h = size
        m, n, n1, n2 = _block_geometry(L, h, interpret)
        _n1, _n2, *consts = _constants(n)
        kernel = functools.partial(
            _dft_corr_block_kernel, n=n, n1=n1, n2=n2, bc=bc, L=L, m=m
        )
        # 2 * ceil(m/2) packed fwd + ceil(m/2) packed inverse, 8 dots each
        flops = _PASSES.get(_PREC, 3) * 12 * (n1 + n2) * ((m + 1) // 2) * B * D * n // m
        vmem_kw = {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)}

    io_spec = pl.BlockSpec((1, bc, L), lambda c, b: (b, c, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((D, L), jnp.float32),
        grid=(D // bc, B),
        in_specs=[
            io_spec, io_spec,
            const_spec((n1, n1)), const_spec((n1, n1)),
            const_spec((n2, n1)), const_spec((n2, n1)),
            const_spec((n2, n2)), const_spec((n2, n2)),
        ],
        out_specs=pl.BlockSpec((bc, L), lambda c, b: (c, 0), memory_space=pltpu.VMEM),
        **({"interpret": True} if interpret else {}),
        **vmem_kw,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * B * D * L + D * L) * 4,
            transcendentals=0,
        ),
    )(u, g, *(jnp.asarray(c) for c in consts))
    return out


#: kill switch for the fused training backward (CHIMERALM_PALLAS_BWD=0
#: restores the einsum-path autodiff backward)
_BWD_ENABLED = os.environ.get("CHIMERALM_PALLAS_BWD", "1") != "0"


def bwd_pallas_supported(fft_size: int, D: int, L: int, B: int) -> bool:
    """True when BOTH backward legs ride fused kernels on this backend.

    du reuses the forward routing (flip identity); dk needs a correlation
    geometry.  Anything unsupported falls back to the einsum-path autodiff."""
    if not _BWD_ENABLED or jax.default_backend() != "tpu":
        return False
    du_ok = (
        supported(fft_size, D, L, B)
        or supported_oa(fft_size, D, L, B)
        or (_BLOCK_ENABLED and L >= _MIN_BLOCK_L and supported_block(D, L))
    )
    return du_ok and supported_corr(D, L, B)


def conv_bwd_pallas(u, k, bias, g, fft_size, interpret: bool = False):
    """Fused-kernel VJP of ``fft_conv_pallas``: (du, dk, dbias).

    du = flip(forward(flip(g), k, bias)) — the forward op verbatim on
    time-reversed cotangents; dk = the batch-summed correlation kernel;
    dbias = one fused elementwise reduction."""
    gf = jnp.flip(g, axis=-1)
    if interpret:
        B, D, L = u.shape
        if supported(fft_size, D, L, B):
            du_r = dft_conv_pallas(gf, k, bias, fft_size, interpret=True)
        else:
            du_r = dft_conv_pallas_block(gf, k, bias, interpret=True)
        dk = dft_corr_pallas(u, g, interpret=True)
    else:
        du_r = _pallas_forward(gf, k, bias, fft_size)
        dk = dft_corr_pallas(u, g)
    du = jnp.flip(du_r, axis=-1).astype(u.dtype)
    g32 = g.astype(jnp.float32)
    u32 = u.astype(jnp.float32)
    dbias = jnp.einsum("bdl,bdl->d", g32, u32)
    return du, dk.astype(k.dtype), dbias.astype(bias.dtype)


# ---- fused training mixer: custom VJP around the block mixer kernel --------
#
# Round-4 left the training forward on the XLA short conv + gating
# (~19 ms per 262k-token batch) plus the unfused long conv; inference got
# the fused mixer because its filter spectra are cached per bucket.  But the
# filter is per-STEP data in training, not per-batch: evaluating the
# implicit-filter MLP + its block spectra once per step (XLA matmuls) lets
# the training forward ride the SAME fused kernel.  The custom VJP below
# closes the loop with every gradient on a fused kernel:
#
#   fwd:  kspec = block_filter_spectra(k)          (XLA, once per step)
#         y = mixer_conv_fused(uc3, w, b, fb, kspec)    (one kernel)
#   bwd:  recompute short convs + gate g (XLA elementwise, cheap)
#         z  = conv(g, k) + fb*g         via _pallas_forward(kspec cached)
#         dz = dy * x0c;  dx0c = dy * z
#         dg = flip(conv(flip(dz), k, fb))  -- the flip identity (du leg)
#         dk = corr(g, dz)               via dft_corr_pallas
#         short-conv transposes + tap/bias grads  (XLA elementwise)
#
# z is REMATERIALIZED in the backward (one extra fused conv) instead of
# being a second kernel output: dual outputs are a known Mosaic crash
# vector (see the 32k-bucket notes above) and the recompute reuses the
# step's cached spectra, so it costs one kernel, not a filter re-DFT.

#: kill switch (CHIMERALM_FUSED_TRAIN=0 restores the round-4 unfused
#: training forward: XLA short conv + gating + fft_conv_pallas)
_FUSED_TRAIN_ENABLED = os.environ.get("CHIMERALM_FUSED_TRAIN", "1") != "0"
# low-precision (input-dtype) elementwise legs in the fused-train backward;
# reductions still accumulate in f32.  CHIMERALM_BWD_LOWP=0 forces f32.
_BWD_LOWP = os.environ.get("CHIMERALM_BWD_LOWP", "1") != "0"


def _train_route(D: int, L: int, B: int, interpret: bool = False) -> str | None:
    """Fused-train routing, mirroring the inference mixer: "direct" (the
    batch-pair kernel at n = next-pow2(2L)) below _MIN_BLOCK_L, "block"
    (the m-block kernel) above — the exact kernel geometries the inference
    engine compiles per bucket."""
    if not (_FUSED_TRAIN_ENABLED and _BLOCK_ENABLED and _BWD_ENABLED):
        return None
    if not interpret and jax.default_backend() != "tpu":
        return None
    if L < _MIN_FUSED_L or not supported_corr(D, L, B, interpret=interpret):
        return None
    if L < _MIN_BLOCK_L:
        if mixer_fused_direct_available(D, L, B, interpret=interpret):
            n = 1
            while n < 2 * L:
                n <<= 1
            # the bwd z/du convs ride the direct conv kernels at the same n
            if supported(n, D, L, B) or interpret:
                return "direct"
        return None
    if supported_block(D, L, interpret=interpret):
        return "block"
    return None


def mixer_train_available(D: int, L: int, B: int, interpret: bool = False) -> bool:
    """True when the fused-train mixer covers (D, L, B) on this backend."""
    return _train_route(D, L, B, interpret) is not None


def _sconv_f32(x, wt, b, L: int):
    """Causal W-tap depthwise conv of (B, bc, L) in f32 (XLA elementwise).

    Same tap convention as ``_short_conv_vmem``: y[t] = b + sum_j
    wt[W-1-j] * x[t-j]."""
    w = wt.shape[-1]
    xpad = jnp.pad(x, ((0, 0), (0, 0), (w - 1, 0)))
    out = wt[None, :, w - 1 : w] * x + b[None, :, None]
    for s in range(w - 1):
        out = out + wt[None, :, s : s + 1] * xpad[..., s : s + L]
    return out


def _sconv_transpose(dxc, wt, L: int):
    """VJP of ``_sconv_f32`` w.r.t. x: dx[t] = sum_s wt[s] * dxc[t + W-1-s]."""
    w = wt.shape[-1]
    dpad = jnp.pad(dxc, ((0, 0), (0, 0), (0, w - 1)))
    out = wt[None, :, w - 1 : w] * dxc
    for s in range(w - 1):
        out = out + wt[None, :, s : s + 1] * dpad[..., w - 1 - s : w - 1 - s + L]
    return out


def _sconv_tap_grads(dxc, x, w: int, L: int):
    """(dw, db) of ``_sconv_f32``: dw[c,s] = sum_{b,t} dxc[b,c,t]*xpad[b,c,t+s].

    Inputs may be bf16 (the low-precision backward); the tap/bias
    reductions accumulate in f32 regardless."""
    xpad = jnp.pad(x, ((0, 0), (0, 0), (w - 1, 0)))
    dw = jnp.stack(
        [jnp.einsum("bct,bct->c", dxc, xpad[..., s : s + L],
                    preferred_element_type=jnp.float32) for s in range(w)], axis=-1
    )
    return dw, dxc.astype(jnp.float32).sum(axis=(0, 2))


def _train_routing(uc3_shape) -> tuple[str, int]:
    """(route, size) for the fused-train mixer — a pure function of shapes
    and backend, so fwd and bwd recompute it instead of carrying statics
    through the residuals (strings are not JAX types)."""
    interp = jax.default_backend() != "tpu"
    B, C3, L = uc3_shape
    D = C3 // 3
    route = _train_route(D, L, B, interp)
    if route is None:
        # direct callers (tests) bypass the availability gate: block when a
        # geometry exists, else the pair-direct kernel
        h = BLOCK_H or _choose_block_h(D, L, interp)
        route = "block" if h is not None else "direct"
    if route == "block":
        return route, BLOCK_H or _choose_block_h(D, L, interp)
    n = 1
    while n < 2 * L:
        n <<= 1
    return route, n


def _train_fwd_value(uc3, short_weight, short_bias, filter_bias, k,
                     return_z: bool = False):
    """Route + run the fused mixer value; returns (y, route, size, kspec).

    ``return_z`` additionally emits the pre-gate conv output from the same
    kernel call (second kernel output) — the VJP's z residual, saving a
    whole conv rematerialization in the backward."""
    interp = jax.default_backend() != "tpu"
    route, size = _train_routing(uc3.shape)
    if route == "block":
        kspec = block_filter_spectra(k, size)
        y = mixer_conv_fused(uc3, short_weight, short_bias, filter_bias, kspec,
                             h=size, interpret=interp, return_z=return_z)
        return y, route, size, kspec
    kspec = direct_filter_spectra(k, size)
    y = mixer_conv_fused_direct(uc3, short_weight, short_bias, filter_bias,
                                kspec, size, interpret=interp, return_z=return_z)
    return y, route, size, kspec


@jax.custom_vjp
def mixer_conv_fused_train(uc3, short_weight, short_bias, filter_bias, k):
    """Differentiable fused order-2 mixer core for TRAINING.

    Same value contract as ``mixer_conv_fused`` but takes the raw (D, L)
    time-domain filter ``k`` (per-step data from the implicit-filter MLP)
    and computes the spectra per step.  Routing mirrors the inference
    mixer (pair-direct kernel below _MIN_BLOCK_L, m-block above), so the
    training step compiles the same kernel geometries the engine already
    proves per bucket.  All five arguments receive gradients; the
    long-conv legs of the VJP ride the fused kernels."""
    return _train_fwd_value(uc3, short_weight, short_bias, filter_bias, k)[0]


def _mct_fwd(uc3, short_weight, short_bias, filter_bias, k):
    (y, z), _route, _size, kspec = _train_fwd_value(
        uc3, short_weight, short_bias, filter_bias, k, return_z=True)
    return y, (uc3, short_weight, short_bias, filter_bias, k, kspec, z)


def _mct_bwd(res, dy):
    uc3, short_weight, short_bias, filter_bias, k, kspec, z = res
    interp = jax.default_backend() != "tpu"
    route, size = _train_routing(uc3.shape)
    B, C3, L = uc3.shape
    D = C3 // 3
    w = short_weight.shape[-1]
    # Elementwise legs run in the INPUT dtype (bf16 in training — every
    # pass over a (B, 3D, L) tensor at 16x8192 is 400 MB in f32, and the
    # main gradient signal already flows through bf16 kernels anyway);
    # reductions (tap grads, bias grads, dfb) accumulate in f32.
    # CHIMERALM_BWD_LOWP=0 restores the all-f32 elementwise backward.
    ct = jnp.float32
    if _BWD_LOWP and jnp.issubdtype(uc3.dtype, jnp.floating):
        ct = uc3.dtype
    wt = short_weight[:, 0, :].astype(ct)  # (3D, W)
    sb = short_bias.astype(ct)
    fb = filter_bias.astype(jnp.float32)

    x0 = uc3[:, :D].astype(ct)
    x1 = uc3[:, D : 2 * D].astype(ct)
    v = uc3[:, 2 * D :].astype(ct)
    x0c = _sconv_f32(x0, wt[:D], sb[:D], L)
    x1c = _sconv_f32(x1, wt[D : 2 * D], sb[D : 2 * D], L)
    vc = _sconv_f32(v, wt[2 * D :], sb[2 * D :], L)
    g = vc * x1c

    dy32 = dy.astype(ct)
    gb = g.astype(uc3.dtype)
    # du leg on the same kernel family the forward proved: block kernel
    # with the step's cached spectra, or the direct kernels at the same
    # fft size (their filter spectrum lives in-kernel); z itself came out
    # of the forward kernel as its second output (no rematerialization)
    if route == "block":
        conv = functools.partial(dft_conv_pallas_block, k=k, bias=fb, h=size,
                                 interpret=interp, kspec=kspec)
    elif interp:
        # interpret mode (CPU numerics tests): _select_kernel's lane-
        # legality rules still apply to the direct kernels, so small test
        # geometries use the einsum path for the conv legs instead
        from chimeralm_tpu.ops.matmul_fft import fft_conv_matmul

        conv = lambda u_: fft_conv_matmul(u_, k, fb, size)  # noqa: E731
    else:
        conv = lambda u_: dft_conv_pallas(u_, k, fb, size)  # noqa: E731
    dz = dy32 * x0c
    dx0c = dy32 * z.astype(ct)

    dzb = dz.astype(uc3.dtype)
    dzf = jnp.flip(dzb, axis=-1)
    dg_r = conv(dzf)
    dk = dft_corr_pallas(gb, dzb, interpret=interp)
    dg = jnp.flip(dg_r, axis=-1).astype(ct)
    dfb = jnp.einsum("bdl,bdl->d", dz, g, preferred_element_type=jnp.float32)

    dvc = dg * x1c
    dx1c = dg * vc

    dx0 = _sconv_transpose(dx0c, wt[:D], L)
    dx1 = _sconv_transpose(dx1c, wt[D : 2 * D], L)
    dv = _sconv_transpose(dvc, wt[2 * D :], L)
    duc3 = jnp.concatenate([dx0, dx1, dv], axis=1).astype(uc3.dtype)

    dw0, db0 = _sconv_tap_grads(dx0c, x0, w, L)
    dw1, db1 = _sconv_tap_grads(dx1c, x1, w, L)
    dwv, dbv = _sconv_tap_grads(dvc, v, w, L)
    dsw = jnp.concatenate([dw0, dw1, dwv], axis=0)[:, None, :].astype(short_weight.dtype)
    dsb = jnp.concatenate([db0, db1, dbv], axis=0).astype(short_bias.dtype)
    return (duc3, dsw, dsb, dfb.astype(filter_bias.dtype), dk.astype(k.dtype))


mixer_conv_fused_train.defvjp(_mct_fwd, _mct_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fft_conv_pallas(u, k, bias, fft_size):
    """Differentiable wrapper: Pallas forward (direct / overlap-add /
    m-block); backward via fused kernels (``conv_bwd_pallas``) when the
    geometry supports them, einsum-path autodiff otherwise."""
    return _pallas_forward(u, k, bias, fft_size)


def _fcp_fwd(u, k, bias, fft_size):
    return _pallas_forward(u, k, bias, fft_size), (u, k, bias)


def _fcp_bwd(fft_size, res, g):
    u, k, bias = res
    B, D, L = u.shape
    if bwd_pallas_supported(fft_size, D, L, B):
        return conv_bwd_pallas(u, k, bias, g, fft_size)
    from chimeralm_tpu.ops.matmul_fft import fft_conv_matmul

    _, vjp = jax.vjp(lambda u_, k_, b_: fft_conv_matmul(u_, k_, b_, fft_size), u, k, bias)
    return vjp(g)


fft_conv_pallas.defvjp(_fcp_fwd, _fcp_bwd)
