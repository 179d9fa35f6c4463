"""Mamba2-style SSM backbones in pure JAX (chunked SSD scan).

Reference: chimeralm/models/components/mamba.py — three classifier wrappers
over ``mamba_ssm.Mamba2`` CUDA blocks.  Here the block is TPU-native: the
selective-SSM recurrence runs through ``chimeralm_tpu.ops.ssd`` (MXU-tiled
chunked scan), with the Mamba2 block structure: fused in_proj ->
causal depthwise conv + SiLU on (x, B, C) -> softplus dt -> SSD ->
gated RMSNorm -> out_proj.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from chimeralm_tpu.ops.fft_conv import short_depthwise_conv
from chimeralm_tpu.ops.ssd import ssd_chunked


class Mamba2Block(nn.Module):
    """One Mamba2 mixer (d_model -> d_model)."""

    d_model: int
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    chunk: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, L, D = x.shape
        d_inner = self.expand * self.d_model
        nheads = d_inner // self.headdim
        N = self.d_state

        proj = nn.Dense(2 * d_inner + 2 * N + nheads, use_bias=False, name="in_proj")(x)
        z, xs, Bm, Cm, dt = jnp.split(
            proj, [d_inner, 2 * d_inner, 2 * d_inner + N, 2 * d_inner + 2 * N], axis=-1
        )

        # causal depthwise conv over (x, B, C) channels
        conv_ch = d_inner + 2 * N
        xbc = jnp.concatenate([xs, Bm, Cm], axis=-1)
        conv_w = self.param(
            "conv1d_weight", nn.initializers.lecun_normal(), (conv_ch, 1, self.d_conv)
        )
        conv_b = self.param("conv1d_bias", nn.initializers.zeros, (conv_ch,))
        xbc = jnp.swapaxes(xbc, 1, 2)
        xbc = short_depthwise_conv(xbc, conv_w, conv_b)
        xbc = jnp.swapaxes(xbc, 1, 2)
        xbc = nn.silu(xbc)
        xs, Bm, Cm = jnp.split(xbc, [d_inner, d_inner + N], axis=-1)

        def dt_bias_init(_key):
            # dt ~ logUniform[1e-3, 1e-1]; bias = softplus^-1(dt)
            dt0 = jnp.exp(
                jnp.asarray(
                    np.random.default_rng(0).uniform(math.log(1e-3), math.log(1e-1), nheads),
                    jnp.float32,
                )
            )
            return jnp.log(jnp.expm1(dt0))

        dt_bias = self.param("dt_bias", dt_bias_init)
        dt = nn.softplus(dt + dt_bias)

        A_log = self.param(
            "A_log", lambda key: jnp.log(jnp.arange(1, nheads + 1, dtype=jnp.float32))
        )
        A = -jnp.exp(A_log)
        Dp = self.param("D", nn.initializers.ones, (nheads,))

        xh = xs.reshape(B, L, nheads, self.headdim)
        y = ssd_chunked(xh, dt, A, Bm, Cm, Dp, chunk=self.chunk)
        y = y.reshape(B, L, d_inner)

        # gated RMSNorm then out_proj (Mamba2 ordering)
        y = y * nn.silu(z)
        y = nn.RMSNorm(name="norm")(y)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


def _mean_max_pool(x, mask=None):
    """(mean + max) / 2 pooling (reference: mamba.py:106-109)."""
    if mask is None:
        return (x.mean(axis=1) + x.max(axis=1)) / 2
    m = mask[..., None].astype(x.dtype)
    mean = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1)
    mx = (x * m + (1 - m) * -1e9).max(axis=1)
    return (mean + mx) / 2


class _PoolerClassifier(nn.Module):
    embedding_dim: int
    number_of_classes: int
    dropout: float

    @nn.compact
    def __call__(self, pooled, deterministic=True):
        h = nn.Dense(self.embedding_dim, name="pooler_dense")(pooled)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embedding_dim // 2, name="cls_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.number_of_classes, name="cls_1")(h)


class MambaSequenceClassification(nn.Module):
    """Learned-pos + input-block variant (reference: mamba.py:11-113)."""

    vocab_size: int = 12
    embedding_dim: int = 256
    number_of_layers: int = 4
    model_max_length: int = 32768
    dropout: float = 0.1
    number_of_classes: int = 2
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    padding_idx: int = 4

    @nn.compact
    def __call__(self, input_ids, input_quals=None, attention_mask=None, deterministic=True):
        x = nn.Embed(self.vocab_size, self.embedding_dim, name="embedding")(input_ids)
        x = x * (input_ids != self.padding_idx)[..., None].astype(x.dtype)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, self.model_max_length, self.embedding_dim),
        )
        x = x + pos[:, : x.shape[1]]
        x = nn.Dense(self.embedding_dim, name="input_dense")(x)
        x = nn.LayerNorm(name="input_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if attention_mask is not None:
            x = x * attention_mask[..., None].astype(x.dtype)
        for i in range(self.number_of_layers):
            res = x
            x = Mamba2Block(
                self.embedding_dim, self.d_state, self.d_conv, self.expand, self.headdim,
                name=f"mamba_{i}",
            )(x, deterministic)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = res + x
            if attention_mask is not None:
                x = x * attention_mask[..., None].astype(x.dtype)
        pooled = _mean_max_pool(x, attention_mask)
        return _PoolerClassifier(self.embedding_dim, self.number_of_classes, self.dropout, name="head")(
            pooled, deterministic
        )


class MambaSequenceClassificationSP(nn.Module):
    """Plain stack variant (reference: mamba.py:116-192)."""

    vocab_size: int = 12
    embedding_dim: int = 256
    number_of_layers: int = 4
    number_of_classes: int = 2
    dropout: float = 0.1
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    padding_idx: int = 4

    @nn.compact
    def __call__(self, input_ids, input_quals=None, attention_mask=None, deterministic=True):
        x = nn.Embed(self.vocab_size, self.embedding_dim, name="embedding")(input_ids)
        x = x * (input_ids != self.padding_idx)[..., None].astype(x.dtype)
        for i in range(self.number_of_layers):
            res = x
            x = Mamba2Block(
                self.embedding_dim, self.d_state, self.d_conv, self.expand, self.headdim,
                name=f"mamba_{i}",
            )(x, deterministic)
            x = res + x
        pooled = _mean_max_pool(x, attention_mask)
        return _PoolerClassifier(self.embedding_dim, self.number_of_classes, self.dropout, name="head")(
            pooled, deterministic
        )


class MambaSequenceClassificationPositional(nn.Module):
    """Learned/sinusoidal positional variant (reference: mamba.py:195-335)."""

    vocab_size: int = 12
    embedding_dim: int = 256
    number_of_layers: int = 4
    number_of_classes: int = 2
    dropout: float = 0.1
    max_seq_length: int = 32768
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    padding_idx: int = 4
    pos_embedding_type: str = "learned"  # "learned" | "sinusoidal" | "none"

    @nn.compact
    def __call__(self, input_ids, input_quals=None, attention_mask=None, deterministic=True):
        from chimeralm_tpu.models.transformer import sinusoidal_positions

        L = input_ids.shape[1]
        x = nn.Embed(self.vocab_size, self.embedding_dim, name="embedding")(input_ids)
        x = x * (input_ids != self.padding_idx)[..., None].astype(x.dtype)
        if self.pos_embedding_type == "learned":
            pos_table = nn.Embed(self.max_seq_length, self.embedding_dim, name="position_embedding")
            x = x + pos_table(jnp.arange(L))[None]
        elif self.pos_embedding_type == "sinusoidal":
            x = x + jnp.asarray(sinusoidal_positions(self.max_seq_length, self.embedding_dim))[None, :L]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.number_of_layers):
            res = x
            x = Mamba2Block(
                self.embedding_dim, self.d_state, self.d_conv, self.expand, self.headdim,
                name=f"mamba_{i}",
            )(x, deterministic)
            x = res + x
        pooled = _mean_max_pool(x, attention_mask)
        return _PoolerClassifier(self.embedding_dim, self.number_of_classes, self.dropout, name="head")(
            pooled, deterministic
        )
