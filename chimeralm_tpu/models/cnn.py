"""DNAConvNet backbone in Flax (reference: chimeralm/models/components/cnn.py).

Embedding -> N x [Conv1d(same) -> BatchNorm -> GELU -> MaxPool -> Dropout]
-> global average pool -> [Dense -> BatchNorm -> GELU -> Dropout -> Dense].

BatchNorm carries running stats in the ``batch_stats`` collection (the task
threads them through ``TrainState.model_state``); under a dp mesh the batch
statistics are computed over the *global* batch by XLA (axis-sharded mean),
matching the reference's ``sync_batchnorm`` DDP setting
(reference: configs/trainer/ddp.yaml).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp


class DNAConvNet(nn.Module):
    vocab_size: int = 12
    embedding_dim: int = 128
    num_filters: Sequence[int] = (64, 128, 256)
    kernel_sizes: Sequence[int] = (7, 5, 3)
    pool_sizes: Sequence[int] = (2, 2, 2)
    hidden_dim: int = 256
    number_of_classes: int = 2
    dropout: float = 0.1
    padding_idx: int = 4

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        input_quals: jnp.ndarray | None = None,
        attention_mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.embedding_dim, name="embedding")(input_ids)
        # padding_idx semantics: PAD embeddings contribute zeros
        pad_mask = (input_ids != self.padding_idx)[..., None].astype(x.dtype)
        if attention_mask is not None:
            pad_mask = pad_mask * attention_mask[..., None].astype(x.dtype)
        x = x * pad_mask

        # convs operate channels-last (B, L, C) — XLA's native TPU layout
        m = pad_mask
        for i, (filters, kernel, pool) in enumerate(
            zip(self.num_filters, self.kernel_sizes, self.pool_sizes)
        ):
            x = nn.Conv(filters, kernel_size=(kernel,), padding="SAME", name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name=f"bn_{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.max_pool(x, window_shape=(pool,), strides=(pool,))
            m = nn.max_pool(m, window_shape=(pool,), strides=(pool,))
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        if attention_mask is not None:
            # masked AdaptiveAvgPool1d(1): mean over VALID positions only.
            # With fixed-shape TPU batches the plain mean is dominated by the
            # pad fraction (a per-batch length statistic, not content), which
            # destabilizes the head; the reference pads to longest-in-batch
            # (small pad fraction) so its unmasked mean is benign.  Without a
            # mask this reduces to the reference's exact pooling.
            x = (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        else:
            x = x.mean(axis=1)  # AdaptiveAvgPool1d(1)
        x = nn.Dense(self.hidden_dim, name="fc_0")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="fc_bn")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.number_of_classes, name="fc_1")(x)
