"""Vestigial template MLP kept for inventory parity.

Reference: chimeralm/models/components/simple_dense_net.py — the
lightning-template leftover dense net; never used by the pipeline.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SimpleDenseNet(nn.Module):
    input_size: int = 784
    lin1_size: int = 256
    lin2_size: int = 256
    lin3_size: int = 256
    output_size: int = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        batch_size = x.shape[0]
        x = x.reshape(batch_size, -1)
        for size in (self.lin1_size, self.lin2_size, self.lin3_size):
            x = nn.Dense(size)(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9)(x)
            x = nn.relu(x)
        return nn.Dense(self.output_size)(x)
