"""Flax HyenaDNA backbone + binary classifier head (the flagship model).

Re-implements, TPU-first, the graph of the HF remote-code backbone
``LongSafari/hyenadna-*-hf`` used by the reference
(reference: chimeralm/models/components/hyena.py:237 loads it via AutoModel;
the architecture is the HyenaDNA decoder stack: token embedding ->
n_layer x [LN -> HyenaOperator -> +res -> LN -> MLP -> +res] -> LN)
plus the reference's ``BinarySequenceClassifier`` head
(reference: chimeralm/models/components/hyena.py:6-146).

Parameter tree mirrors the torch module names (``in_proj``, ``short_filter``,
``filter_fn/implicit_filter_0`` ...) so the torch->Flax checkpoint converter
in ``chimeralm_tpu.models.convert`` is a name map plus layout transposes.

TPU design notes
----------------
* All matmuls sit on (B*L, D) shapes that tile the MXU; compute dtype is
  configurable (bf16 forward / f32 params), FFTs always run f32.
* The implicit filter (L x emb_dim -> L x D MLP) is batch-independent; under
  jit it is computed once per compiled shape and fused by XLA.
* No data-dependent control flow: one compiled graph per (B, L) bucket.
* ``attention_mask`` is optional everywhere.  With right padding + masked
  pooling the logits are invariant to the bucket length (pads only influence
  their own causal positions, which the head masks out) — this is the fast
  production path.  Parity mode (mask=None, left padding) reproduces the
  reference's batch-dependent semantics bit-for-bit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from chimeralm_tpu.ops.fft_conv import fft_conv, short_depthwise_conv


@dataclasses.dataclass(frozen=True)
class HyenaConfig:
    """Configuration of the HyenaDNA backbone (HF ``HyenaConfig`` fields)."""

    vocab_size: int = 12
    d_model: int = 256
    n_layer: int = 4
    d_inner: int = 1024
    max_seq_len: int = 32768
    emb_dim: int = 5
    filter_order: int = 64
    num_inner_mlps: int = 2
    short_filter_order: int = 3
    hyena_order: int = 2
    activation_freq: float = 10.0
    train_freq: bool = True
    embed_dropout: float = 0.1
    hyena_dropout: float = 0.0
    hyena_filter_dropout: float = 0.0
    head_dropout: float = 0.1
    layer_norm_epsilon: float = 1e-5
    pad_vocab_size_multiple: int = 8
    # exponential modulation of the implicit filter
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    modulation_target: float = 1e-2
    modulation_shift: float = 0.05
    # numerics
    dtype: Any = jnp.float32
    fft_pow2: bool = True
    fft_method: str = "auto"  # "auto" | "xla" | "matmul" (MXU two-stage DFT)
    #: sequence-parallel mesh axis: set when the forward runs inside a
    #: shard_map with input_ids sharded along L (parallel/seq_parallel.py)
    sp_axis: str | None = None

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m


def _positional_features(L: int, seq_len: int, emb_dim: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(z, t): z (1, L, emb_dim) positional features, t (1, L, 1) in [0, 1].

    Matches the HyenaDNA positional embedding: t = linspace(0,1,seq_len),
    z = [t, Re exp(-i f w), Im exp(-i f w)] with w = 2*pi*t_rescaled/seq_len
    and f = linspace(1e-4, bands-1, bands); all grids built over the *full*
    ``seq_len`` then sliced to ``L``.
    """
    t = jnp.linspace(0.0, 1.0, seq_len, dtype=jnp.float32)[None, :, None]
    bands = (emb_dim - 1) // 2
    t_rescaled = jnp.linspace(0.0, seq_len - 1, seq_len, dtype=jnp.float32)[None, :, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = jnp.linspace(1e-4, bands - 1, bands, dtype=jnp.float32)[None, None, :]
    angle = f * w  # (1, seq_len, bands)
    z = jnp.concatenate([t, jnp.cos(-angle), jnp.sin(-angle)], axis=-1)
    return z[:, :L], t[:, :L]


class HyenaSin(nn.Module):
    """sin(freq * x) activation with (optionally trainable) per-unit freq."""

    config: HyenaConfig

    @nn.compact
    def __call__(self, x):
        freq = self.param(
            "freq",
            lambda _key: self.config.activation_freq * jnp.ones((1, self.config.filter_order), jnp.float32),
        )
        return jnp.sin(freq * x)


class HyenaFilter(nn.Module):
    """Implicit MLP filter k(t) with exponential decay modulation."""

    config: HyenaConfig

    def setup(self):
        cfg = self.config
        d_filter = cfg.d_model * (cfg.hyena_order - 1)
        self.bias = self.param("bias", nn.initializers.normal(1.0), (d_filter,))
        # implicit_filter_{0,2,4,...}: Dense; _{1,3,5,...}: Sin — names mirror
        # the torch nn.Sequential indices for the checkpoint converter.
        layers = []
        layers.append(nn.Dense(cfg.filter_order, name="implicit_filter_0"))
        layers.append(HyenaSin(cfg, name="implicit_filter_1"))
        idx = 2
        for _ in range(cfg.num_inner_mlps):
            layers.append(nn.Dense(cfg.filter_order, name=f"implicit_filter_{idx}"))
            layers.append(HyenaSin(cfg, name=f"implicit_filter_{idx + 1}"))
            idx += 2
        layers.append(nn.Dense(d_filter, use_bias=False, name=f"implicit_filter_{idx}"))
        self.filter_layers = layers

        # modulation decay rates (fixed buffer in torch; recomputed here)
        max_decay = math.log(cfg.modulation_target) / cfg.fast_decay_pct
        min_decay = math.log(cfg.modulation_target) / cfg.slow_decay_pct
        self.deltas = jnp.linspace(min_decay, max_decay, d_filter, dtype=jnp.float32)[None, None, :]

    def filter(self, L: int) -> jnp.ndarray:
        """Evaluate the filter over positions 0..L-1 -> (L, (order-1)*d_model)."""
        z, t = _positional_features(L, self.config.max_seq_len, self.config.emb_dim)
        h = z
        for layer in self.filter_layers:
            h = layer(h)
        decay = jnp.exp(-t * jnp.abs(self.deltas))
        h = h * (decay + self.config.modulation_shift)
        return h[0]


class HyenaOperator(nn.Module):
    """Order-N Hyena mixer: projections, short conv, FFT long conv, gating."""

    config: HyenaConfig

    def setup(self):
        cfg = self.config
        inner_width = cfg.d_model * (cfg.hyena_order + 1)
        self.in_proj = nn.Dense(inner_width, name="in_proj")
        self.out_proj = nn.Dense(cfg.d_model, name="out_proj")
        self.short_filter_weight = self.param(
            "short_filter_weight",
            nn.initializers.lecun_normal(),
            (inner_width, 1, cfg.short_filter_order),
        )
        self.short_filter_bias = self.param(
            "short_filter_bias", nn.initializers.zeros, (inner_width,)
        )
        self.filter_fn = HyenaFilter(cfg, name="filter_fn")

    def __call__(
        self, u: jnp.ndarray, deterministic: bool = True, k_cached: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        cfg = self.config
        B, L, D = u.shape
        order = cfg.hyena_order

        if cfg.sp_axis is not None:
            L = L * jax.lax.psum(1, cfg.sp_axis)  # filter spans the GLOBAL length

        u = self.in_proj(u)  # (B, L, (order+1)*D)
        u = jnp.swapaxes(u, 1, 2)  # (B, C, L)

        # k_cached: the implicit filter is a function of (params, L) only —
        # at inference the engine precomputes it once per length bucket and
        # passes it in, skipping the filter MLP in every batch forward
        # (PredictEngine.cache_filters).  A (k, spectra) tuple additionally
        # carries per-order filter block spectra for the pallas block
        # kernel (PredictEngine caches those per bucket too).
        k_spec = None
        if isinstance(k_cached, (tuple, list)):
            k_cached, k_spec = k_cached

        # fused inference mixer: short conv + gating + long conv in ONE
        # pallas kernel on the RAW projections (cached filter spectra
        # required); the XLA-level short conv alone measured ~19 ms per
        # 262k-token batch.  The cache format selects the route: 4-D block
        # spectra -> m-block kernel (long buckets), 3-D direct spectra ->
        # batch-pair kernel (small/mid buckets).
        if (
            k_spec is not None
            and order == 2
            and cfg.sp_axis is None
            and cfg.fft_method in ("auto", "pallas")
        ):
            from chimeralm_tpu.ops.pallas_dft import (
                mixer_conv_fused,
                mixer_conv_fused_direct,
                mixer_fused_available,
                mixer_fused_direct_available,
            )

            if k_spec[0][0].ndim == 4 and mixer_fused_available(D, L):
                y = mixer_conv_fused(
                    u, self.short_filter_weight, self.short_filter_bias,
                    self.filter_fn.bias, k_spec[0],
                )
                return self.out_proj(jnp.swapaxes(y, 1, 2))
            if k_spec[0][0].ndim == 3 and mixer_fused_direct_available(D, L, u.shape[0]):
                n = 1
                while n < 2 * L:
                    n <<= 1
                y = mixer_conv_fused_direct(
                    u, self.short_filter_weight, self.short_filter_bias,
                    self.filter_fn.bias, k_spec[0], n,
                )
                return self.out_proj(jnp.swapaxes(y, 1, 2))

        # fused TRAINING mixer: no spectra cache (the filter is per-step
        # data), but the implicit filter + its block spectra are evaluated
        # once per step as XLA matmuls and the whole mixer core rides the
        # same fused kernel, with a custom VJP whose long-conv legs are
        # fused too (pallas_dft.mixer_conv_fused_train).  Covers the block
        # geometry; everything else falls through to the unfused path.
        if (
            k_spec is None
            and order == 2
            and cfg.sp_axis is None
            and cfg.fft_method in ("auto", "pallas")
        ):
            from chimeralm_tpu.ops.pallas_dft import (
                mixer_conv_fused_train,
                mixer_train_available,
            )

            if mixer_train_available(D, L, u.shape[0]):
                k = k_cached if k_cached is not None else self.filter_fn.filter(L)
                kmat = k.reshape(L, D).T  # (D, L), order == 2
                y = mixer_conv_fused_train(
                    u, self.short_filter_weight, self.short_filter_bias,
                    self.filter_fn.bias, kmat.astype(jnp.float32),
                )
                return self.out_proj(jnp.swapaxes(y, 1, 2))

        # the unfused conv path only understands the block-spectra format
        # (fft_conv feeds it to the m-block kernel); drop a direct-spectra
        # cache here (e.g. an odd-row partial batch) and recompute normally
        if k_spec is not None and k_spec[0][0].ndim != 4:
            k_spec = None

        uc = short_depthwise_conv(u, self.short_filter_weight, self.short_filter_bias,
                                  axis_name=cfg.sp_axis)

        pieces = [uc[:, i * D : (i + 1) * D] for i in range(order + 1)]
        *x, v = pieces

        k = k_cached if k_cached is not None else self.filter_fn.filter(L)
        k = k.reshape(L, order - 1, D).transpose(1, 2, 0)  # (order-1, D, L)
        bias = self.filter_fn.bias.reshape(order - 1, D)

        for o, x_i in enumerate(reversed(x[1:])):
            v = v * x_i
            v = fft_conv(v, k[o], bias[o], pow2=cfg.fft_pow2, method=cfg.fft_method,
                         sp_axis=cfg.sp_axis,
                         k_spec=None if k_spec is None else k_spec[o])
        y = v * x[0]
        y = jnp.swapaxes(y, 1, 2)  # (B, L, D)
        return self.out_proj(y)


class HyenaMlp(nn.Module):
    config: HyenaConfig

    def setup(self):
        self.fc1 = nn.Dense(self.config.d_inner, name="fc1")
        self.fc2 = nn.Dense(self.config.d_model, name="fc2")

    def __call__(self, x):
        # HF HyenaMlp uses tanh-approximate GELU
        return self.fc2(nn.gelu(self.fc1(x), approximate=True))


class HyenaBlock(nn.Module):
    """Pre-norm residual block: LN -> mixer -> +res; LN -> MLP -> +res."""

    config: HyenaConfig

    def setup(self):
        eps = self.config.layer_norm_epsilon
        self.mixer = HyenaOperator(self.config, name="mixer")
        self.norm1 = nn.LayerNorm(epsilon=eps, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=eps, name="norm2")
        self.mlp = HyenaMlp(self.config, name="mlp")

    def __call__(self, x, deterministic: bool = True, k_cached: jnp.ndarray | None = None):
        x = x + self.mixer(self.norm1(x), deterministic=deterministic, k_cached=k_cached)
        x = x + self.mlp(self.norm2(x))
        return x


class HyenaBackbone(nn.Module):
    """Embedding -> N Hyena blocks -> final LayerNorm; returns (B, L, D)."""

    config: HyenaConfig

    def setup(self):
        cfg = self.config
        self.word_embeddings = nn.Embed(
            cfg.padded_vocab_size, cfg.d_model, dtype=cfg.dtype, name="word_embeddings"
        )
        self.layers = [HyenaBlock(cfg, name=f"layers_{i}") for i in range(cfg.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_f")
        self.embed_drop = nn.Dropout(cfg.embed_dropout)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        deterministic: bool = True,
        filter_cache: tuple | None = None,
    ) -> jnp.ndarray:
        h = self.word_embeddings(input_ids).astype(self.config.dtype)
        h = self.embed_drop(h, deterministic=deterministic)
        for i, layer in enumerate(self.layers):
            h = layer(h, deterministic=deterministic,
                      k_cached=None if filter_cache is None else filter_cache[i])
        return self.ln_f(h)

    def filters(self, L: int) -> tuple:
        """Per-layer implicit filters over positions 0..L-1 (inference cache).

        Pure function of the parameters: ``model.apply(vars, L,
        method="filters")`` yields the ``filter_cache`` accepted by
        ``__call__`` — evaluate once per length bucket, reuse every batch.
        """
        return tuple(layer.mixer.filter_fn.filter(L) for layer in self.layers)


class ResidualBlock(nn.Module):
    """Linear-GELU-Linear residual block of the classifier head.

    Reference: chimeralm/models/components/hyena.py:149-180.
    """

    hidden_dim: int
    dropout: float = 0.1

    def setup(self):
        self.layers_0 = nn.Dense(self.hidden_dim, name="layers_0")
        self.layers_3 = nn.Dense(self.hidden_dim, name="layers_3")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, deterministic: bool = True):
        out = self.layers_0(x)
        out = nn.gelu(out, approximate=False)  # torch nn.GELU() = erf
        out = self.drop(out, deterministic=deterministic)
        out = self.layers_3(out)
        out = self.drop(out, deterministic=deterministic)
        return out + x


class BinarySequenceClassifier(nn.Module):
    """Pooling (mean/max/attention/cls) + MLP head -> (B, 2) logits.

    Reference: chimeralm/models/components/hyena.py:6-146.  The reference
    calls it with ``attention_mask=None`` (hyena.py:256); passing a mask here
    enables the padding-invariant fast path.
    """

    input_dim: int = 256
    hidden_dim: int = 512
    num_layers: int = 2
    dropout: float = 0.1
    pooling_type: str = "attention"
    #: sequence-parallel mesh axis (hidden_states arrive L-sharded)
    sp_axis: str | None = None
    use_residual: bool = True

    def setup(self):
        if self.pooling_type == "attention":
            self.attention_0 = nn.Dense(self.hidden_dim // 2, name="attention_0")
            self.attention_2 = nn.Dense(1, name="attention_2")
        # classifier stack mirrors torch Sequential indices: Dense at 0, 3, ...
        dense_idx = 0
        layers = []
        prev = self.input_dim
        for i in range(self.num_layers):
            layers.append(nn.Dense(self.hidden_dim, name=f"classifier_{dense_idx}"))
            dense_idx += 3
            if self.use_residual and i > 0 and prev == self.hidden_dim:
                layers.append(ResidualBlock(self.hidden_dim, self.dropout, name=f"classifier_{dense_idx}"))
                dense_idx += 1
            else:
                prev = self.hidden_dim
        self.classifier_layers = layers
        self.output_layer = nn.Dense(2, name="output_layer")
        self.drop = nn.Dropout(self.dropout)

    def _pool(self, h, mask):
        sp = self.sp_axis
        psum = (lambda x: jax.lax.psum(x, sp)) if sp else (lambda x: x)
        pmax = (lambda x: jax.lax.pmax(x, sp)) if sp else (lambda x: x)
        if self.pooling_type == "mean":
            if mask is None:
                total = psum(jnp.full((), h.shape[1], h.dtype))
                return psum(h.sum(axis=1)) / total
            m = mask[..., None].astype(h.dtype)
            denom = jnp.maximum(psum(mask.sum(axis=1, keepdims=True)), 1).astype(h.dtype)
            return psum((h * m).sum(axis=1)) / denom
        if self.pooling_type == "max":
            if mask is None:
                return pmax(h.max(axis=1))
            m = mask[..., None].astype(h.dtype)
            return pmax((h * m + (1 - m) * -1e9).max(axis=1))
        if self.pooling_type == "attention":
            a = self.attention_0(h)
            a = nn.gelu(a, approximate=False)
            a = self.attention_2(a)  # (B, L_local, 1)
            # softmax over the GLOBAL sequence: pmax-stabilized exp + psum
            # (stabilizer is gradient-free, so pmax — which has no JVP rule —
            # only ever sees stopped values)
            amax = pmax(jnp.max(jax.lax.stop_gradient(a), axis=1, keepdims=True))
            a = jnp.exp(a - amax)
            if mask is not None:
                a = a * mask[..., None].astype(h.dtype)
            a = a / (psum(a.sum(axis=1, keepdims=True)) + 1e-9)
            return psum((h * a).sum(axis=1))
        if self.pooling_type == "cls":
            if sp:
                first = (jax.lax.axis_index(sp) == 0).astype(h.dtype)
                return psum(h[:, 0, :] * first)
            return h[:, 0, :]
        raise ValueError(f"Unsupported pooling type: {self.pooling_type}")

    def __call__(self, hidden_states, attention_mask=None, deterministic: bool = True):
        pooled = self._pool(hidden_states, attention_mask)
        feats = pooled
        for layer in self.classifier_layers:
            if isinstance(layer, ResidualBlock):
                feats = layer(feats, deterministic=deterministic)
            else:
                feats = layer(feats)
                feats = nn.gelu(feats, approximate=False)
                feats = self.drop(feats, deterministic=deterministic)
        return self.output_layer(feats)


class QualLayer(nn.Module):
    """Quality-score embedding layer.

    Inventory parity with the reference (chimeralm/models/components/
    hyena.py:183-212): defined but *not wired into the forward pass* — the
    reference's ``HyenaDna.forward`` accepts ``input_quals`` and ignores
    them (hyena.py:244-256); we reproduce that contract.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, input_quals: jnp.ndarray) -> jnp.ndarray:
        q = input_quals.reshape(-1, 1)
        q = nn.Dense(self.hidden_dim, name="fc1")(q)
        q = nn.gelu(q, approximate=False)
        return nn.Dense(self.hidden_dim, name="fc2")(q)


class HyenaDnaClassifier(nn.Module):
    """Backbone + head; the production ChimeraLM graph.

    Reference: chimeralm/models/components/hyena.py:215-256 (``HyenaDna``)
    with the ``yangliz5/chimeralm`` hyperparameters
    (reference: chimeralm/models/lm.py:12-37).
    """

    config: HyenaConfig = HyenaConfig()
    number_of_classes: int = 2

    def setup(self):
        self.backbone = HyenaBackbone(self.config, name="backbone")
        self.head = BinarySequenceClassifier(
            input_dim=self.config.d_model, hidden_dim=512, num_layers=2,
            dropout=self.config.head_dropout,
            sp_axis=self.config.sp_axis, name="head"
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        input_quals: jnp.ndarray | None = None,
        attention_mask: jnp.ndarray | None = None,
        deterministic: bool = True,
        filter_cache: tuple | None = None,
    ) -> jnp.ndarray:
        # input_quals accepted-and-unused, mirroring the reference graph
        # (QualLayer exists but is never wired: hyena.py:183-212, 244-256).
        h = self.backbone(input_ids, deterministic=deterministic, filter_cache=filter_cache)
        return self.head(h, attention_mask, deterministic=deterministic)

    def filters(self, L: int) -> tuple:
        """Per-layer implicit filter cache for length-``L`` inference."""
        return self.backbone.filters(L)


def _resolve_dtype(overrides: dict) -> dict:
    # allow YAML-friendly dtype strings ("bfloat16"/"float32")
    dtype = overrides.get("dtype")
    if isinstance(dtype, str):
        overrides["dtype"] = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16, "float32": jnp.float32}[dtype]
    return overrides


def small_32k_config(**overrides) -> HyenaConfig:
    """hyenadna-small-32k-seqlen: d_model=256, 4 layers, 32k context."""
    base = dict(d_model=256, n_layer=4, d_inner=1024, max_seq_len=32768)
    base.update(_resolve_dtype(overrides))
    return HyenaConfig(**base)


def tiny_config(**overrides) -> HyenaConfig:
    """A miniature config for tests (fast CPU compile)."""
    base = dict(d_model=32, n_layer=2, d_inner=64, max_seq_len=512, filter_order=16)
    base.update(_resolve_dtype(overrides))
    return HyenaConfig(**base)
