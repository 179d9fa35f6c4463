"""Chunked state-space-duality (SSD) scan — the Mamba2 inner op on TPU.

The reference's Mamba backbones call ``mamba_ssm.Mamba2`` (CUDA kernels,
reference: chimeralm/models/components/mamba.py:7-8,46-48).  This is the
TPU-native equivalent: the selective state-space recurrence

    S_t = a_t * S_{t-1} + B_t (x) xbar_t          (state: N x P per head)
    y_t = C_t^T S_t + D * x_t

evaluated with the chunked SSD algorithm — within a chunk the recurrence
becomes dense (Q x Q) matmuls that tile the MXU; across chunks a
``lax.scan`` carries the (H, N, P) state.  No L x N x P tensor ever
materializes, and wall-clock scales as O(L * Q) matmul FLOPs instead of a
length-L sequential scan.

Shapes (n_groups = 1, B/C shared across heads):
    x  (B, L, H, P)   dt (B, L, H)   A (H,) < 0
    Bm (B, L, N)      Cm (B, L, N)   D (H,)
returns y (B, L, H, P).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ssd_chunked(x, dt, A, Bm, Cm, D, chunk: int = 128):
    Bt, L, H, P = x.shape
    N = Bm.shape[-1]
    if L % chunk:
        pad = chunk - L % chunk
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
    Lp = x.shape[1]
    nc = Lp // chunk

    xbar = x * dt[..., None]                      # (B, Lp, H, P)
    log_a = dt * A[None, None, :]                 # (B, Lp, H)  log decay (<0)

    # chunked views
    xbar_c = xbar.reshape(Bt, nc, chunk, H, P)
    log_a_c = log_a.reshape(Bt, nc, chunk, H)
    B_c = Bm.reshape(Bt, nc, chunk, N)
    C_c = Cm.reshape(Bt, nc, chunk, N)

    la = jnp.cumsum(log_a_c, axis=2)              # (B, nc, Q, H) within-chunk cumsum
    la_total = la[:, :, -1, :]                    # (B, nc, H)

    # intra-chunk: M[i,j] = (C_i . B_j) * exp(la_i - la_j) for j <= i
    cb = jnp.einsum("bnqs,bnks->bnqk", C_c, B_c)  # (B, nc, Q, Q)
    decay = la[:, :, :, None, :] - la[:, :, None, :, :]   # (B, nc, Q, Q, H)
    causal = jnp.tril(jnp.ones((chunk, chunk), bool))
    # -1e30 (not -inf): keeps exp()'s gradient NaN-free under the mask
    M = cb[..., None] * jnp.exp(jnp.where(causal[None, None, :, :, None], decay, -1e30))
    y_intra = jnp.einsum("bnqkh,bnkhp->bnqhp", M, xbar_c)

    # per-chunk state contribution: sum_j exp(la_total - la_j) B_j (x) xbar_j
    w = jnp.exp(la_total[:, :, None, :] - la)     # (B, nc, Q, H)
    chunk_state = jnp.einsum("bnks,bnkh,bnkhp->bnhsp", B_c, w, xbar_c)  # (B, nc, H, N, P)

    # scan chunk states: S_{c} = exp(la_total_c) * S_{c-1} + chunk_state_c
    def scan_fn(S, inp):
        a_tot, cs = inp
        S_new = S * jnp.exp(a_tot)[:, :, None, None] + cs
        return S_new, S  # emit the state *entering* the chunk

    a_tot_sw = jnp.moveaxis(la_total, 1, 0)       # (nc, B, H)
    cs_sw = jnp.moveaxis(chunk_state, 1, 0)       # (nc, B, H, N, P)
    S0 = jnp.zeros((Bt, H, N, P), x.dtype)
    _, S_in = jax.lax.scan(scan_fn, S0, (a_tot_sw, cs_sw))
    S_in = jnp.moveaxis(S_in, 0, 1)               # (B, nc, H, N, P) state before chunk

    # inter-chunk: y_inter[i] = exp(la_i) * C_i^T S_in
    y_inter = jnp.einsum("bnqs,bnhsp->bnqhp", C_c, S_in) * jnp.exp(la)[..., None]

    y = (y_intra + y_inter).reshape(Bt, Lp, H, P)[:, :L]
    return y + x[:, :L] * D[None, None, :, None]


def ssd_reference(x, dt, A, Bm, Cm, D):
    """Naive sequential recurrence (numpy, tests only)."""
    import numpy as np

    x, dt, A, Bm, Cm, D = (np.asarray(t, np.float64) for t in (x, dt, A, Bm, Cm, D))
    Bt, L, H, P = x.shape
    N = Bm.shape[-1]
    y = np.zeros_like(x)
    for b in range(Bt):
        S = np.zeros((H, N, P))
        for t in range(L):
            a = np.exp(dt[b, t] * A)  # (H,)
            S = S * a[:, None, None] + (
                Bm[b, t][None, :, None] * (dt[b, t][:, None] * x[b, t])[:, None, :]
            )
            y[b, t] = np.einsum("s,hsp->hp", Cm[b, t], S) + D[:, None] * x[b, t]
    return y
