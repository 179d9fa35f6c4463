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
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 0,
    clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """AdamW with an injectable learning rate (mutable in opt_state).

    ``warmup_steps`` applies a linear per-step ramp multiplier on top of the
    injected (plateau-scheduled) base LR — from-scratch Hyena training needs
    it (sin-activation filters destabilize at full LR from step 0).
    ``clip_norm`` adds global-norm gradient clipping before the update (a
    single loss spike can knock a converged long-context Hyena into the
    chance basin — round-2 pilot observation).
    """
    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(adamw)
    if warmup_steps > 0:
        parts.append(optax.scale_by_schedule(
            lambda step: jnp.minimum(1.0, (step + 1) / float(warmup_steps))
        ))
    return parts[0] if len(parts) == 1 else optax.chain(*parts)


def make_adamw_grouped(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 0,
    filter_lr_scale: float = 1.0,
    head_lr_scale: float = 1.0,
    clip_norm: float | None = None,
    head_paths: tuple = ("head",),
) -> optax.GradientTransformation:
    """AdamW with separate param groups for filter and classifier-head params.

    The HyenaDNA training recipe (Safari standalone_hyena: HyenaFilter params
    carry their own ``lr`` and ``weight_decay=0`` optim-group hints) excludes
    the sin-activated filter MLP from weight decay and lets it run at a scaled
    learning rate.  Any param whose tree path contains ``filter_fn`` (the
    implicit filter MLP, its freq, and the conv bias) lands in the group.

    ``head_lr_scale`` puts the classifier head (path containing ``head``:
    attention pooling + MLP + output layer) in its own LR group.  Rationale:
    the attention-pooling softmax weight on the chimera-junction position
    scales ~1/L, so every context doubling during curriculum transfer needs
    the pooling score gap re-sharpened by ~ln 2 — the head must move at a
    much higher LR than the (already converged, easily destroyed) backbone.
    Measured round 2: transfer stages at backbone-safe LR plateau ~0.84-0.92
    F1 with errors concentrated on the longest reads.
    """

    def label(params):
        def walk(tree, path):
            out = {}
            for k, v in tree.items():
                p = path + (k,)
                if isinstance(v, dict):
                    out[k] = walk(v, p)
                else:
                    if any("filter_fn" in part for part in p):
                        out[k] = "filter"
                    elif any(part in head_paths for part in p):
                        out[k] = "head"
                    else:
                        out[k] = "default"
            return out
        return walk(params, ())

    default = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )
    filt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate * filter_lr_scale, weight_decay=0.0
    )
    head = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate * head_lr_scale, weight_decay=weight_decay
    )
    tx = optax.multi_transform({"default": default, "filter": filt, "head": head}, label)
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(tx)
    if warmup_steps > 0:
        parts.append(optax.scale_by_schedule(
            lambda step: jnp.minimum(1.0, (step + 1) / float(warmup_steps))
        ))
    return parts[0] if len(parts) == 1 else optax.chain(*parts)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place (returns new state).

    Handles the plain ``make_adamw`` state, the warmup-chained variant, and
    ``make_adamw_grouped`` (each group keeps its LR ratio to the default
    group when the plateau scheduler steps the base LR).
    """
    inner = opt_state
    if not hasattr(inner, "hyperparams") and not hasattr(inner, "inner_states"):
        # chained (clip / warmup ramp): find the stateful transform
        inner = next(
            s for s in opt_state if hasattr(s, "hyperparams") or hasattr(s, "inner_states")
        )
    if hasattr(inner, "inner_states"):  # multi_transform groups
        states = inner.inner_states
        base = float(states["default"].inner_state.hyperparams["learning_rate"])
        for group_state in states.values():
            hp = group_state.inner_state.hyperparams
            scale = float(hp["learning_rate"]) / base if base > 0 else 1.0
            hp["learning_rate"] = hp["learning_rate"] * 0 + lr * scale
        return opt_state
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
