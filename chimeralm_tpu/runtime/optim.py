"""Optimizers and schedulers (optax), mirroring the reference recipe.

Reference: chimeralm/models/lm.py:33-34 — AdamW(lr=1e-4, wd=0.01) +
ReduceLROnPlateau(mode="min", factor=0.1, patience=10) stepped per epoch on
``val/loss``, plus EarlyStopping(monitor="val/f1", patience=40, mode="max")
(reference: configs/callbacks/default.yaml:15-20).

The plateau scheduler is host-side state: the trainer calls ``step(metric)``
once per epoch and writes the returned LR into the optimizer's injected
hyperparams — same semantics as torch's scheduler, no retracing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax


def make_adamw(
    learning_rate: float = 1e-4, weight_decay: float = 0.01, warmup_steps: int = 0
) -> optax.GradientTransformation:
    """AdamW with an injectable learning rate (mutable in opt_state).

    ``warmup_steps`` applies a linear per-step ramp multiplier on top of the
    injected (plateau-scheduled) base LR — from-scratch Hyena training needs
    it (sin-activation filters destabilize at full LR from step 0).
    """
    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )
    if warmup_steps <= 0:
        return adamw
    ramp = optax.scale_by_schedule(
        lambda step: jnp.minimum(1.0, (step + 1) / float(warmup_steps))
    )
    return optax.chain(adamw, ramp)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place (returns new state)."""
    inner = opt_state
    if not hasattr(inner, "hyperparams"):  # chained with warmup ramp
        inner = opt_state[0]
    inner.hyperparams["learning_rate"] = inner.hyperparams["learning_rate"] * 0 + lr
    return opt_state


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch-semantics plateau scheduler (mode min/max, factor, patience)."""

    lr: float
    mode: str = "min"
    factor: float = 0.1
    patience: int = 10
    min_lr: float = 0.0
    threshold: float = 1e-4

    best: float | None = None
    num_bad_epochs: int = 0

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def step(self, metric: float) -> float:
        """Record an epoch metric; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr


@dataclasses.dataclass
class EarlyStopping:
    """monitor/patience/mode early stopping (Lightning semantics)."""

    patience: int = 40
    mode: str = "max"
    min_delta: float = 0.0

    best: float | None = None
    wait: int = 0
    stopped: bool = False

    def step(self, metric: float) -> bool:
        """Returns True when training should stop."""
        improved = (
            self.best is None
            or (self.mode == "max" and metric > self.best + self.min_delta)
            or (self.mode == "min" and metric < self.best - self.min_delta)
        )
        if improved:
            self.best = metric
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.stopped = True
        return self.stopped
