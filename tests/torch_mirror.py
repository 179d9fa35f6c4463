"""Independent torch mirror of the HyenaDNA + classifier graph, for parity tests.

This re-creates, in torch, the exact computation graph that
``chimeralm_tpu.models.hyena`` implements in Flax, using the *module naming of
the HF remote-code backbone* (``backbone.layers.{i}.mixer.in_proj`` ...) and
the reference head (``head.attention.0`` ..., reference:
chimeralm/models/components/hyena.py:6-146).  A random-initialized instance
produces a state dict shaped like a real ``yangliz5/chimeralm`` download, so
the converter and the cross-framework numerics can both be validated offline.

Test-only code: the product never imports torch.
"""

import math

import torch
from torch import nn


class Sin(nn.Module):
    def __init__(self, dim, w=10.0, train_freq=True):
        super().__init__()
        init = w * torch.ones(1, dim)
        self.freq = nn.Parameter(init) if train_freq else init

    def forward(self, x):
        return torch.sin(self.freq * x)


class PositionalEmbedding(nn.Module):
    def __init__(self, emb_dim, seq_len):
        super().__init__()
        self.seq_len = seq_len
        t = torch.linspace(0, 1, seq_len)[None, :, None]
        bands = (emb_dim - 1) // 2
        t_rescaled = torch.linspace(0, seq_len - 1, seq_len)[None, :, None]
        w = 2 * math.pi * t_rescaled / seq_len
        f = torch.linspace(1e-4, bands - 1, bands)[None, None]
        z = torch.exp(-1j * f * w)
        z = torch.cat([t, z.real, z.imag], dim=-1)
        self.register_buffer("z", z)
        self.register_buffer("t", t)

    def forward(self, L):
        return self.z[:, :L], self.t[:, :L]


class ExponentialModulation(nn.Module):
    def __init__(self, d_model, fast_decay_pct=0.3, slow_decay_pct=1.5, target=1e-2, shift=0.05):
        super().__init__()
        self.shift = shift
        max_decay = math.log(target) / fast_decay_pct
        min_decay = math.log(target) / slow_decay_pct
        deltas = torch.linspace(min_decay, max_decay, d_model)[None, None]
        self.register_buffer("deltas", deltas)

    def forward(self, t, x):
        decay = torch.exp(-t * self.deltas.abs())
        return x * (decay + self.shift)


def fftconv(u, k, D):
    seqlen = u.shape[-1]
    fft_size = 2 * seqlen
    k_f = torch.fft.rfft(k.float(), n=fft_size) / fft_size
    u_f = torch.fft.rfft(u.to(dtype=k_f.real.dtype), n=fft_size)
    y = torch.fft.irfft(u_f * k_f, n=fft_size, norm="forward")[..., :seqlen]
    out = y + u * D.unsqueeze(-1)
    return out.to(dtype=u.dtype)


class HyenaFilter(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d_filter = cfg["d_model"] * (cfg["hyena_order"] - 1)
        order = cfg["filter_order"]
        self.bias = nn.Parameter(torch.randn(d_filter))
        self.pos_emb = PositionalEmbedding(cfg["emb_dim"], cfg["max_seq_len"])
        layers = [nn.Linear(cfg["emb_dim"], order), Sin(order, cfg["activation_freq"])]
        for _ in range(cfg["num_inner_mlps"]):
            layers += [nn.Linear(order, order), Sin(order, cfg["activation_freq"])]
        layers.append(nn.Linear(order, d_filter, bias=False))
        self.implicit_filter = nn.Sequential(*layers)
        self.modulation = ExponentialModulation(d_filter)

    def filter(self, L):
        z, t = self.pos_emb(L)
        h = self.implicit_filter(z)
        return self.modulation(t, h)


class HyenaOperator(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg["d_model"]
        order = cfg["hyena_order"]
        inner = d * (order + 1)
        self.d_model, self.order = d, order
        self.in_proj = nn.Linear(d, inner)
        self.out_proj = nn.Linear(d, d)
        w = cfg["short_filter_order"]
        self.short_filter = nn.Conv1d(inner, inner, w, padding=w - 1, groups=inner)
        self.filter_fn = HyenaFilter(cfg)

    def forward(self, u):
        L = u.size(-2)
        u = self.in_proj(u).transpose(1, 2)
        uc = self.short_filter(u)[..., :L]
        *x, v = uc.split(self.d_model, dim=1)
        k = self.filter_fn.filter(L)[0]
        k = k.reshape(L, self.order - 1, self.d_model).permute(1, 2, 0)
        bias = self.filter_fn.bias.reshape(self.order - 1, self.d_model)
        for o, x_i in enumerate(reversed(x[1:])):
            v = v * x_i
            v = fftconv(v, k[o], bias[o])
        y = (v * x[0]).transpose(1, 2)
        return self.out_proj(y)


class Mlp(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.fc1 = nn.Linear(cfg["d_model"], cfg["d_inner"])
        self.fc2 = nn.Linear(cfg["d_inner"], cfg["d_model"])

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x), approximate="tanh"))


class Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        eps = cfg["layer_norm_epsilon"]
        self.mixer = HyenaOperator(cfg)
        self.norm1 = nn.LayerNorm(cfg["d_model"], eps=eps)
        self.norm2 = nn.LayerNorm(cfg["d_model"], eps=eps)
        self.mlp = Mlp(cfg)

    def forward(self, x):
        x = x + self.mixer(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class Embeddings(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        m = cfg["pad_vocab_size_multiple"]
        vocab = ((cfg["vocab_size"] + m - 1) // m) * m
        self.word_embeddings = nn.Embedding(vocab, cfg["d_model"])

    def forward(self, ids):
        return self.word_embeddings(ids)


class Backbone(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.embeddings = Embeddings(cfg)
        self.layers = nn.ModuleList(Block(cfg) for _ in range(cfg["n_layer"]))
        self.ln_f = nn.LayerNorm(cfg["d_model"], eps=cfg["layer_norm_epsilon"])

    def forward(self, ids):
        h = self.embeddings(ids)
        for layer in self.layers:
            h = layer(h)
        return self.ln_f(h)


class HyenaDNAModel(nn.Module):
    """Mirrors AutoModel('LongSafari/...-hf'): top-level 'backbone' module."""

    def __init__(self, cfg):
        super().__init__()
        self.backbone = Backbone(cfg)

    def forward(self, ids):
        return self.backbone(ids)


class ResidualBlock(nn.Module):
    def __init__(self, hidden_dim, dropout=0.1):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Linear(hidden_dim, hidden_dim),
            nn.GELU(),
            nn.Dropout(dropout),
            nn.Linear(hidden_dim, hidden_dim),
        )
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        return self.dropout(self.layers(x)) + x


class BinarySequenceClassifier(nn.Module):
    def __init__(self, input_dim=256, hidden_dim=512, num_layers=2, dropout=0.1):
        super().__init__()
        self.attention = nn.Sequential(
            nn.Linear(input_dim, hidden_dim // 2),
            nn.GELU(),
            nn.Linear(hidden_dim // 2, 1),
            nn.Softmax(dim=1),
        )
        layers = []
        prev = input_dim
        for i in range(num_layers):
            layers += [nn.Linear(prev, hidden_dim), nn.GELU(), nn.Dropout(dropout)]
            if i > 0 and prev == hidden_dim:
                layers.append(ResidualBlock(hidden_dim, dropout))
            else:
                prev = hidden_dim
        self.classifier = nn.Sequential(*layers)
        self.output_layer = nn.Linear(hidden_dim, 2)

    def forward(self, h, attention_mask=None):
        a = self.attention(h)
        pooled = (h * a).sum(dim=1)
        return self.output_layer(self.classifier(pooled))


class ChimeraLMTorch(nn.Module):
    """state_dict-compatible stand-in for the full ClassificationLit.net graph."""

    def __init__(self, cfg):
        super().__init__()
        self.backbone = HyenaDNAModel(cfg)
        self.head = BinarySequenceClassifier(input_dim=cfg["d_model"])

    def forward(self, ids):
        return self.head(self.backbone(ids))


TINY_CFG = dict(
    vocab_size=12,
    d_model=32,
    n_layer=2,
    d_inner=64,
    max_seq_len=512,
    emb_dim=5,
    filter_order=16,
    num_inner_mlps=2,
    short_filter_order=3,
    hyena_order=2,
    activation_freq=10.0,
    layer_norm_epsilon=1e-5,
    pad_vocab_size_multiple=8,
)

SMALL_32K_CFG = dict(TINY_CFG, d_model=256, n_layer=4, d_inner=1024, max_seq_len=32768, filter_order=64)
