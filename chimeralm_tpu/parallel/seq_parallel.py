"""Sequence-parallel Hyena long convolution: a distributed four-step DFT.

Shards the SEQUENCE dimension of the FFT convolution over a mesh axis —
the TPU-native answer to contexts whose activations (or FFT work) outgrow
one chip.  The length-n transform factors n = n1 * n2 (j = j1 + n1*j2,
j1 fast) and runs as Bailey's four-step algorithm under ``shard_map``:

    local DFT over j2  ->  twiddle W_n^{-j1 k2}  ->  all-to-all transpose
    ->  local DFT over j1

with the pointwise filter product applied in the scrambled, k2-sharded
frequency layout (k = k2 + n2*k1) and the mirrored four-step inverse.  All
cross-device traffic is four ``lax.all_to_all`` transposes riding the ICI
mesh; every local stage is an MXU matmul.  The causal zero padding
(n = 2L) lands on whole j2-columns, so the padded half never moves over
the wire, and both the forward stage-1 and the inverse stage-B contract
only the n2/2 data columns.

Derivation (j = j1 + n1*j2, k = k2 + n2*k1):
    X[k2 + n2 k1] = sum_j1 W_n1^{-j1 k1} W_n^{-j1 k2}
                      (sum_j2 x[j1 + n1 j2] W_n2^{-j2 k2})
so step 1 contracts j2 (local after the first transpose), the twiddle is
the elementwise W_n^{-j1 k2} grid, and step 2 contracts j1 (local after
the second transpose).

Reference behavior: the fftconv of the HyenaDNA backbone
(reference: chimeralm/models/components/hyena.py:237) — here distributed;
the reference has no sequence parallelism at all (SURVEY §5:
"architectural, not distributed").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from chimeralm_tpu.ops.matmul_fft import _PREC, _factor


@functools.lru_cache(maxsize=None)
def _sp_constants(n: int):
    """cos/sin stage matrices + twiddle grid for the four-step split."""
    n1, n2 = _factor(n)
    f = np.float32
    a1 = -2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1  # (j1, k1)
    a2 = -2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2  # (j2, k2)
    tw = -2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n   # (j1, k2)
    return (
        n1, n2,
        np.cos(a1).astype(f), np.sin(a1).astype(f),
        np.cos(a2).astype(f), np.sin(a2).astype(f),
        np.cos(tw).astype(f), np.sin(tw).astype(f),
    )


def supported_sp(fft_size: int, L: int, n_shards: int) -> bool:
    """True when the shard geometry divides exactly (see the guards)."""
    if fft_size != 2 * L or L % n_shards:
        return False
    n1, n2 = _factor(fft_size)
    if n1 < 8 or n2 % 2:
        return False
    Ls = L // n_shards
    return n1 % n_shards == 0 and n2 % n_shards == 0 and Ls % n1 == 0


def _mm(a, b):
    """f32 matmul over the last axis at the module precision policy."""
    return jnp.einsum("...t,ts->...s", a, b, precision=_PREC)


def fft_conv_sp(u_loc: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray,
                fft_size: int, axis_name: str = "sp") -> jnp.ndarray:
    """Causal conv over an L-sharded input; call INSIDE ``shard_map``.

    u_loc: (B, D, L/S) — this device's contiguous sequence shard.
    k: (D, L) replicated filter; bias: (D,) replicated.
    Returns the local (B, D, L/S) shard of ``y = conv(u, k) + bias * u``
    (the same contract as ``matmul_fft.fft_conv_matmul``).
    """
    S = jax.lax.psum(1, axis_name)
    s = jax.lax.axis_index(axis_name)
    B, D, Ls = u_loc.shape
    L = Ls * S
    n = fft_size
    if not supported_sp(n, L, S):
        raise ValueError(
            f"fft_conv_sp: unsupported shard geometry n={n} L={L} shards={S} "
            "(need n == 2L, S | n1, S | n2, n1 | L/S — see supported_sp)"
        )
    n1, n2, f1r, f1i, f2r, f2i, twr, twi = (jnp.asarray(v) if i >= 2 else v
                                            for i, v in enumerate(_sp_constants(n)))
    n2h = n2 // 2          # data columns (the rest is causal zero padding)
    c = Ls // n1           # data columns held by this device (= n2h / S)
    n1s = n1 // S          # j1 rows per device in the j1-sharded layout
    n2s = n2 // S          # k2 columns per device in the frequency layout
    R = B * D
    dtype_in = u_loc.dtype

    # local contiguous shard -> (rows, local data columns, j1)
    x = u_loc.reshape(R, c, n1).astype(jnp.float32)

    # -- all-to-all #1: contiguous-L (j2-sharded) -> j1-sharded ----------
    x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)
    x = jnp.swapaxes(x, 1, 2)                              # (R, n1s, n2h) [j1_loc, j2]

    # -- forward step 1: DFT over j2 (data columns only) -----------------
    g_r = _mm(x, f2r[:n2h])                                # (R, n1s, n2)
    g_i = _mm(x, f2i[:n2h])

    # -- twiddle W_n^{-j1 k2} at global j1 = s*n1s + local ---------------
    tw_r = jax.lax.dynamic_slice_in_dim(twr, s * n1s, n1s, axis=0)
    tw_i = jax.lax.dynamic_slice_in_dim(twi, s * n1s, n1s, axis=0)
    h_r = g_r * tw_r[None] - g_i * tw_i[None]
    h_i = g_r * tw_i[None] + g_i * tw_r[None]

    # -- all-to-all #2: j1-sharded -> k2-sharded (four-step transpose) ---
    h_r = jax.lax.all_to_all(h_r, axis_name, split_axis=2, concat_axis=1, tiled=True)
    h_i = jax.lax.all_to_all(h_i, axis_name, split_axis=2, concat_axis=1, tiled=True)
    h_r = jnp.swapaxes(h_r, 1, 2)                          # (R, n2s, n1) [k2_loc, j1]
    h_i = jnp.swapaxes(h_i, 1, 2)

    # -- forward step 2: DFT over j1 -> spectrum [k2_loc, k1] ------------
    u_sr = _mm(h_r, f1r) - _mm(h_i, f1i)
    u_si = _mm(h_r, f1i) + _mm(h_i, f1r)

    # -- filter spectrum for the LOCAL k2 shard (filter is replicated, so
    #    each device transforms only its own n2/S frequency columns) ------
    kf = jnp.swapaxes(k.astype(jnp.float32).reshape(D, n2h, n1), 1, 2)  # (D, n1, n2h)
    f2r_loc = jax.lax.dynamic_slice_in_dim(f2r[:n2h], s * n2s, n2s, axis=1)
    f2i_loc = jax.lax.dynamic_slice_in_dim(f2i[:n2h], s * n2s, n2s, axis=1)
    kg_r = _mm(kf, f2r_loc)                                # (D, n1, n2s)
    kg_i = _mm(kf, f2i_loc)
    ktw_r = jax.lax.dynamic_slice_in_dim(twr, s * n2s, n2s, axis=1)  # (n1, n2s)
    ktw_i = jax.lax.dynamic_slice_in_dim(twi, s * n2s, n2s, axis=1)
    kh_r = jnp.swapaxes(kg_r * ktw_r[None] - kg_i * ktw_i[None], 1, 2)  # (D, n2s, n1)
    kh_i = jnp.swapaxes(kg_r * ktw_i[None] + kg_i * ktw_r[None], 1, 2)
    k_sr = (_mm(kh_r, f1r) - _mm(kh_i, f1i)) / n
    k_si = (_mm(kh_r, f1i) + _mm(kh_i, f1r)) / n

    # -- pointwise product in the scrambled sharded layout ---------------
    u_sr = u_sr.reshape(B, D, n2s, n1)
    u_si = u_si.reshape(B, D, n2s, n1)
    p_r = (u_sr * k_sr[None] - u_si * k_si[None]).reshape(R, n2s, n1)
    p_i = (u_sr * k_si[None] + u_si * k_sr[None]).reshape(R, n2s, n1)

    # -- inverse step A: conj-DFT over k1 -> [k2_loc, j1] ----------------
    q_r = _mm(p_r, f1r) + _mm(p_i, f1i)
    q_i = _mm(p_i, f1r) - _mm(p_r, f1i)
    # conj twiddle W_n^{+j1 k2_loc}; current layout is [k2_loc, j1]
    tb_r = jnp.swapaxes(ktw_r, 0, 1)[None]                 # (1, n2s, n1)
    tb_i = jnp.swapaxes(ktw_i, 0, 1)[None]
    r_r = q_r * tb_r + q_i * tb_i
    r_i = q_i * tb_r - q_r * tb_i

    # -- all-to-all #3: k2-sharded -> j1-sharded -------------------------
    r_r = jnp.swapaxes(r_r, 1, 2)                          # (R, n1, n2s)
    r_i = jnp.swapaxes(r_i, 1, 2)
    r_r = jax.lax.all_to_all(r_r, axis_name, split_axis=1, concat_axis=2, tiled=True)
    r_i = jax.lax.all_to_all(r_i, axis_name, split_axis=1, concat_axis=2, tiled=True)
    # (R, n1s, n2) [j1_loc, k2]

    # -- inverse step B: conj-DFT over k2, real part, data columns only --
    y = _mm(r_r, f2r) + _mm(r_i, f2i)                      # (R, n1s, n2)
    y = y[..., :n2h]

    # -- all-to-all #4: j1-sharded -> contiguous-L shards ----------------
    y = jax.lax.all_to_all(y, axis_name, split_axis=2, concat_axis=1, tiled=True)
    # (R, n1, c) [j1, col_loc] -> (R, c, n1) -> contiguous (B, D, Ls)
    y = jnp.swapaxes(y, 1, 2).reshape(B, D, Ls)

    return (y + u_loc.astype(jnp.float32) * bias[None, :, None]).astype(dtype_in)
