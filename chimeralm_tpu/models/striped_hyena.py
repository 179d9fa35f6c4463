"""From-scratch Hyena classifier with fixed exponential-decay filters.

Reference: chimeralm/models/components/striped_hyena.py — a simplified Hyena:
in_proj -> heads -> learned positional embedding add -> rFFT ->
fixed exponential frequency filters (one per order) -> irFFT -> sum over
orders -> out_proj; pre-norm blocks with a 4x GELU MLP; mean-pool classifier.

Note this variant filters *in the frequency domain* directly (multiplying
rfft(x) by a length-``filter_order`` response over the lowest frequency
bins), unlike the real HyenaDNA's time-domain implicit filters.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class SimpleHyenaOperator(nn.Module):
    d_model: int
    l_max: int = 20000
    order: int = 2
    filter_order: int = 64
    num_heads: int = 1
    inner_factor: float = 1.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, L, D = x.shape
        H = self.num_heads
        inner = int(self.d_model * self.inner_factor)
        x = nn.Dense(inner, name="in_proj")(x)
        x = x.reshape(B, L, H, inner // H).transpose(0, 2, 1, 3)  # (B, H, L, d)

        pos = self.param(
            "pos_emb",
            lambda key: jnp.asarray(
                np.random.default_rng(0).normal(size=(1, self.l_max, self.d_model)).astype(np.float32)
            )
            / math.sqrt(self.d_model),
        )
        x = x + pos[:, :L][:, None, :, : x.shape[-1]]

        x_f = jnp.fft.rfft(x.astype(jnp.float32), axis=2)  # (B, H, Lf, d)

        # fixed exponential filters over the first filter_order freq bins
        out = jnp.zeros_like(x)
        for i in range(self.order):
            scale = 1.0 / (2 ** i)
            freq_response = jnp.exp(-jnp.arange(self.filter_order, dtype=jnp.float32) * scale)
            Lf = x_f.shape[2]
            resp = jnp.concatenate([freq_response, jnp.zeros(max(Lf - self.filter_order, 0))])[:Lf]
            y_f = x_f * resp[None, None, :, None]
            y = jnp.fft.irfft(y_f, n=L, axis=2).astype(x.dtype)
            out = out + y

        out = out.transpose(0, 2, 1, 3).reshape(B, L, inner)
        out = nn.Dense(self.d_model, name="out_proj")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class SimpleHyenaBlock(nn.Module):
    d_model: int
    l_max: int = 20000
    order: int = 2
    filter_order: int = 64
    num_heads: int = 4
    inner_factor: float = 2.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(name="norm1")(x)
        x = x + SimpleHyenaOperator(
            self.d_model, self.l_max, self.order, self.filter_order,
            self.num_heads, self.inner_factor, self.dropout, name="hyena",
        )(h, deterministic)
        h = nn.LayerNorm(name="norm2")(x)
        m = nn.Dense(4 * self.d_model, name="mlp_0")(h)
        m = nn.gelu(m, approximate=False)
        m = nn.Dropout(self.dropout)(m, deterministic=deterministic)
        m = nn.Dense(self.d_model, name="mlp_1")(m)
        m = nn.Dropout(self.dropout)(m, deterministic=deterministic)
        return x + m


class HyenaDNAClassifier(nn.Module):
    """Mean-pooled classifier over SimpleHyena blocks (reference: striped_hyena.py:125-179)."""

    seq_len: int = 32768
    vocab_size: int = 12
    d_model: int = 256
    n_layers: int = 4
    num_heads: int = 4
    order: int = 2
    filter_order: int = 64
    inner_factor: float = 2.0
    num_classes: int = 2
    dropout: float = 0.1
    padding_idx: int = 4

    @nn.compact
    def __call__(self, input_ids, input_quals=None, attention_mask=None, deterministic=True):
        x = nn.Embed(self.vocab_size, self.d_model, name="embedding")(input_ids)
        x = x * (input_ids != self.padding_idx)[..., None].astype(x.dtype)
        x = nn.LayerNorm(name="norm")(x)
        for i in range(self.n_layers):
            x = SimpleHyenaBlock(
                self.d_model, self.seq_len, self.order, self.filter_order,
                self.num_heads, self.inner_factor, self.dropout, name=f"layer_{i}",
            )(x, deterministic)
        if attention_mask is not None:
            m = attention_mask[..., None].astype(x.dtype)
            pooled = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1)
        else:
            pooled = x.mean(axis=1)
        h = nn.LayerNorm(name="cls_norm")(pooled)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.num_classes, name="cls_out")(h)
