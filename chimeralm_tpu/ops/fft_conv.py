"""Long-convolution primitives for Hyena on TPU.

The Hyena operator's global convolution is an L-point linear convolution of
each channel with an implicitly parameterized filter, computed as an
FFT-domain pointwise product (reference behavior: the fftconv used by the
HyenaDNA HF remote-code backbone; structural sketch in
reference: chimeralm/models/components/striped_hyena.py:69-80).

TPU notes
---------
* XLA's FFT is fastest on power-of-two sizes.  The torch reference uses
  ``n = 2*L`` exactly; any ``n >= 2L-1`` computes the same *linear*
  convolution (zero padding removes wrap-around), so we default to the next
  power of two — identical math, TPU-friendly tiling.  With power-of-two
  length buckets, ``2*L`` is already a power of two and the two choices
  coincide.
* FFTs run in float32 regardless of the compute dtype: bf16 FFTs lose too
  much precision over 64k points, and XLA computes them in f32 anyway.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def fft_conv(
    u: jnp.ndarray,
    k: jnp.ndarray,
    bias: jnp.ndarray,
    pow2: bool = True,
    method: str = "auto",
    sp_axis: str | None = None,
    k_spec: tuple | None = None,
) -> jnp.ndarray:
    """Causal linear convolution ``y[t] = sum_s k[s] * u[t-s] + bias * u[t]``.

    Args:
        u: (..., D, L) input in any float dtype.
        k: (D, L) filter (float32).
        bias: (D,) per-channel passthrough gain.
        pow2: round the FFT size up to a power of two (same math, faster).
        method: "xla" (native FFT), "matmul" (MXU two-stage DFT), "pallas"
            (fused VMEM-resident DFT-conv kernel), or "auto" (pallas on TPU
            with einsum fallback — the fused kernel measured 136 vs 100
            reads/s end-to-end; the native TPU FFT measured ~8x off pace).
        k_spec: precomputed filter block spectra
            (``pallas_dft.block_spectra_for_length``) — inference-only fast
            path: skips the filter DFTs inside the jitted forward.  Ignored
            off the pallas block route; do not differentiate through it.

    Returns:
        (..., D, L) in ``u.dtype``.
    """
    L = u.shape[-1]
    if sp_axis is not None:
        # sequence-parallel path: u is this device's contiguous L-shard
        # inside shard_map; the distributed four-step DFT handles the rest
        import jax

        from chimeralm_tpu.parallel.seq_parallel import fft_conv_sp

        L_glob = L * jax.lax.psum(1, sp_axis)
        return fft_conv_sp(u, k, bias, 2 * L_glob, axis_name=sp_axis)
    fft_size = 2 * L
    if pow2:
        fft_size = _next_pow2(fft_size)

    if method == "auto":
        import jax

        method = "pallas" if jax.default_backend() == "tpu" else "xla"
    if method == "pallas":
        # fused VMEM-resident kernel; falls back to the einsum path for
        # unsupported factorizations (small buckets) or non-TPU backends
        import jax

        # The overlap-add route (pallas_dft.supported_oa) covers the 32k
        # bucket where every direct kernel hits a Mosaic compile bound:
        # 3 full/head sub-convs at the proven n/2 geometry, measured 25.8 ms
        # vs 31.4 ms einsum (B=8 D=256).
        from chimeralm_tpu.ops.pallas_dft import (
            fft_conv_pallas,
            supported,
            supported_block,
            supported_oa,
        )

        D = u.shape[-2]
        B = u.shape[0] if u.ndim == 3 else 1
        from chimeralm_tpu.ops.pallas_dft import _MIN_BLOCK_L

        if jax.default_backend() == "tpu" and (
            supported(fft_size, D, L, B)
            or supported_oa(fft_size, D, L, B)
            or (L >= _MIN_BLOCK_L and supported_block(D, L))
        ):
            if k_spec is not None:
                # cached-spectra inference path: bypasses the custom-VJP
                # wrapper (grads are never taken at inference; training
                # passes no cache)
                from chimeralm_tpu.ops.pallas_dft import _pallas_forward

                u3 = u[None] if u.ndim == 2 else u
                out = _pallas_forward(u3, k, bias, fft_size, kspec=k_spec)
                return (out[0] if u.ndim == 2 else out).astype(u.dtype)
            if u.ndim == 2:
                return fft_conv_pallas(u[None], k, bias, fft_size)[0].astype(u.dtype)
            return fft_conv_pallas(u, k, bias, fft_size).astype(u.dtype)
        method = "matmul"
    if method == "matmul":
        from chimeralm_tpu.ops.matmul_fft import fft_conv_matmul

        if u.ndim == 2:
            return fft_conv_matmul(u[None], k, bias, fft_size)[0]
        return fft_conv_matmul(u, k, bias, fft_size)

    nf = fft_size // 2 + 1

    # FFTs run on 2-D (rows, L) views: the reshape pins a canonical
    # major-to-minor layout, which XLA:CPU's fft thunk requires when the
    # channel dim is tensor-parallel-sharded (free on TPU).
    lead = u.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    k_f = jnp.fft.rfft(k.astype(jnp.float32), n=fft_size, axis=-1) / fft_size
    u_f = jnp.fft.rfft(u.astype(jnp.float32).reshape(rows, L), n=fft_size, axis=-1)
    u_f = u_f.reshape(*lead, nf)
    prod = (u_f * k_f).reshape(rows, nf)
    y = jnp.fft.irfft(prod, n=fft_size, axis=-1, norm="forward")[..., :L]
    y = y.reshape(*lead, L)
    out = y + u.astype(jnp.float32) * bias[..., :, None]
    return out.astype(u.dtype)


def short_depthwise_conv(u: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
                         axis_name: str | None = None) -> jnp.ndarray:
    """Causal depthwise conv over (B, C, L) with left padding ``W-1``.

    Equivalent to the torch pattern ``Conv1d(C, C, W, padding=W-1, groups=C)``
    followed by ``[..., :L]`` (the HyenaDNA short filter).

    For small tap counts (the HyenaDNA short filter is W=3) the conv is
    evaluated as W shifted multiply-adds — pure VPU elementwise work that XLA
    fuses into neighbors, instead of a grouped ``conv_general_dilated``
    (which lowers poorly for depthwise shapes on TPU).

    Args:
        u: (B, C, L).
        weight: (C, 1, W) torch-layout depthwise kernel.
        bias: (C,) or None.
        axis_name: sequence-parallel mesh axis — u is then the local
            contiguous L-shard and the causal left context comes from the
            previous shard via a (W-1)-element halo exchange (ppermute).
    """
    w = weight.shape[-1]
    if axis_name is not None:
        wt = weight[:, 0, :].astype(u.dtype)  # (C, W)
        S = lax.psum(1, axis_name)
        halo = lax.ppermute(u[..., -(w - 1):], axis_name,
                            [(i, i + 1) for i in range(S - 1)])
        uext = jnp.concatenate([halo, u], axis=-1)  # (B, C, w-1+Ls)
        Ls = u.shape[-1]
        out = sum(wt[:, s][None, :, None] * uext[..., s : s + Ls] for s in range(w))
        if bias is not None:
            out = out + bias.astype(u.dtype)[None, :, None]
        return out
    if w <= 8:
        wt = weight[:, 0, :].astype(u.dtype)  # (C, W)
        L = u.shape[-1]
        # y[t] = sum_s wt[s] * u[t - (W-1) + s]  (causal, left pad W-1).
        # One pad + W static slices: XLA fuses the multiply-adds into a
        # single elementwise pass over the padded buffer.  (The former
        # chained-concatenate shifts materialized W-1 full copies of u —
        # measured ~28 ms per 262k-token batch, ~1/3 of the whole forward.)
        upad = jnp.pad(u, [(0, 0)] * (u.ndim - 1) + [(w - 1, 0)])
        out = wt[:, w - 1][None, :, None] * u
        for s in range(w - 1):
            out = out + wt[:, s][None, :, None] * upad[..., s : s + L]
    else:
        out = lax.conv_general_dilated(
            u,
            weight.astype(u.dtype),
            window_strides=(1,),
            padding=[(w - 1, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=u.shape[1],
        )
    if bias is not None:
        out = out + bias.astype(u.dtype)[None, :, None]
    return out


def reference_conv_naive(u, k, bias):
    """O(L^2) direct implementation for numerical tests (numpy-friendly)."""
    import numpy as np

    u = np.asarray(u, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    bias = np.asarray(bias, dtype=np.float64)
    *lead, D, L = u.shape
    out = np.zeros_like(u)
    for t in range(L):
        # y[t] = sum_{s<=t} k[s] u[t-s]
        acc = np.zeros(u.shape[:-1])
        for s in range(t + 1):
            acc += k[..., s] * u[..., t - s]
        out[..., t] = acc + bias * u[..., t]
    return out
