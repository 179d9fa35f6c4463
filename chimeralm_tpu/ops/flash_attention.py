"""Fused (flash) multi-head attention for TPU via Pallas.

Online-softmax tiling: the grid walks (batch*heads, q-blocks); each program
streams K/V blocks through VMEM keeping running max/denominator, so the
L x L score matrix never materializes in HBM.  Used on the encoder of
``SequenceCNNTransformer`` (reference model: chimeralm/models/components/
transformer.py:64-67 wraps torch's nn.TransformerEncoder; here the hot op is
a hand-fused TPU kernel).

``flash_attention`` dispatches: Pallas kernel on TPU for non-differentiated
(inference) calls with tile-aligned shapes, otherwise the jnp reference
(identical math; XLA still fuses it well, and it is differentiable for
training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def attention_reference(q, k, v, mask=None):
    """Plain softmax attention. q,k,v: (B, H, L, D); mask: (B, L) keep-mask."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(scores.dtype)
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, sm_scale: float):
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (BQ, D)
    L = k_ref.shape[1]
    BQ, D = q.shape
    num_kb = L // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)  # (BK, D)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        bias = jnp.where(mask_ref[0, pl.ds(kb * block_k, block_k)] > 0, 0.0, NEG_INF)
        s = s + bias[None, :]
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * correction + jnp.sum(p, axis=1)
        acc = acc * correction[:, None] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((BQ, D), jnp.float32)
    m0 = jnp.full((BQ,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ,), jnp.float32)
    acc, _m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


def flash_attention_tpu(q, k, v, mask=None, block_q: int = 256, block_k: int = 512):
    """Pallas fused attention. q,k,v: (B, H, L, D); mask: (B, L) or None."""
    B, H, L, D = q.shape
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    assert L % block_q == 0 and L % block_k == 0, (L, block_q, block_k)
    if mask is None:
        mask = jnp.ones((B, L), jnp.int32)
    sm_scale = 1.0 / (D ** 0.5)

    qr = q.reshape(B * H, L, D)
    kr = k.reshape(B * H, L, D)
    vr = v.reshape(B * H, L, D)

    grid = (B * H, L // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda bh, qi: (bh, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
    )(qr, kr, vr, jnp.repeat(mask, H, axis=0))
    return out.reshape(B, H, L, D)


def _tpu_ok(q) -> bool:
    if jax.default_backend() != "tpu":
        return False
    B, H, L, D = q.shape
    return L % 128 == 0 and D % 8 == 0


def flash_attention(q, k, v, mask=None, force: str | None = None):
    """Dispatching attention: Pallas on TPU (inference), jnp reference otherwise."""
    if force == "pallas" or (force is None and _tpu_ok(q)):
        try:
            return flash_attention_tpu(q, k, v, mask)
        except Exception:
            if force == "pallas":
                raise
    return attention_reference(q, k, v, mask)
