"""Streaming classification metrics as pure-JAX count accumulators.

Replaces torchmetrics ``F1Score``/``Precision``/``Recall``/``MeanMetric``
(reference: chimeralm/models/basic_module.py:43-65).  Every metric is a small
pytree of counts; updates run inside jit and cross-device reduction is a
``psum`` (or falls out of jit-sharded batches automatically), matching the
reference's ``sync_dist=True`` semantics (basic_module.py:151).

All follow torchmetrics "binary" task conventions: predictions/targets are
0/1 ints; rows whose target equals ``ignore_index`` are dropped.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

IGNORE_INDEX = -100


@dataclasses.dataclass
class ConfusionCounts:
    tp: Any
    fp: Any
    fn: Any
    tn: Any

    @classmethod
    def zero(cls) -> "ConfusionCounts":
        z = jnp.zeros((), jnp.float32)
        return cls(z, z, z, z)

    def update(self, preds: jnp.ndarray, targets: jnp.ndarray) -> "ConfusionCounts":
        valid = targets != IGNORE_INDEX
        p = (preds == 1) & valid
        t = (targets == 1) & valid
        return ConfusionCounts(
            tp=self.tp + jnp.sum(p & t),
            fp=self.fp + jnp.sum(p & ~t & valid),
            fn=self.fn + jnp.sum(~p & t),
            tn=self.tn + jnp.sum(~p & ~t & valid),
        )

    def merge(self, other: "ConfusionCounts") -> "ConfusionCounts":
        return ConfusionCounts(
            self.tp + other.tp, self.fp + other.fp, self.fn + other.fn, self.tn + other.tn
        )

    # -- derived metrics ---------------------------------------------------
    def f1(self):
        return 2 * self.tp / jnp.maximum(2 * self.tp + self.fp + self.fn, 1)

    def precision(self):
        return self.tp / jnp.maximum(self.tp + self.fp, 1)

    def recall(self):
        return self.tp / jnp.maximum(self.tp + self.fn, 1)

    def accuracy(self):
        total = self.tp + self.fp + self.fn + self.tn
        return (self.tp + self.tn) / jnp.maximum(total, 1)


@dataclasses.dataclass
class MeanState:
    """MeanMetric: running sum / count."""

    total: Any
    count: Any

    @classmethod
    def zero(cls) -> "MeanState":
        return cls(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))

    def update(self, value, weight=1.0) -> "MeanState":
        return MeanState(self.total + value * weight, self.count + weight)

    def compute(self):
        return self.total / jnp.maximum(self.count, 1e-12)


import jax.tree_util as jtu

jtu.register_dataclass(ConfusionCounts, data_fields=["tp", "fp", "fn", "tn"], meta_fields=[])
jtu.register_dataclass(MeanState, data_fields=["total", "count"], meta_fields=[])
