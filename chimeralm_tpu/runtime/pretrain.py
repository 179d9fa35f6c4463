"""Causal next-base language-model pretraining for the Hyena backbone.

The reference's production accuracy comes from *fine-tuning* a pretrained
HyenaDNA backbone (reference: chimeralm/models/components/hyena.py:237 loads
LongSafari weights).  Those weights are unreachable here, so this module
provides the equivalent capability in-framework: next-token pretraining of
``HyenaBackbone`` on DNA (the objective HyenaDNA itself was trained with),
producing a backbone checkpoint the classifier can start from.

The LM head ties to nothing fancy: hidden -> Dense(padded_vocab) logits,
shifted cross-entropy over real (non-pad) positions.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from chimeralm_tpu.models.hyena import HyenaBackbone, HyenaConfig
from chimeralm_tpu.runtime.optim import make_adamw

PAD_ID = 4


class HyenaLM(nn.Module):
    """Backbone + LM head for next-base prediction."""

    config: HyenaConfig

    def setup(self):
        self.backbone = HyenaBackbone(self.config, name="backbone")
        self.lm_head = nn.Dense(self.config.padded_vocab_size, use_bias=False, name="lm_head")

    def __call__(self, input_ids: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = self.backbone(input_ids, deterministic=deterministic)
        return self.lm_head(h)


def next_token_loss(logits: jnp.ndarray, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Shifted CE: position t predicts token t+1; pads excluded."""
    targets = input_ids[:, 1:]
    preds = logits[:, :-1].astype(jnp.float32)
    valid = targets != PAD_ID
    losses = optax.softmax_cross_entropy_with_integer_labels(preds, targets)
    losses = jnp.where(valid, losses, 0.0)
    return losses.sum() / jnp.maximum(valid.sum(), 1)


@dataclasses.dataclass
class PretrainState:
    step: Any
    params: Any
    opt_state: Any

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    PretrainState, data_fields=["step", "params", "opt_state"], meta_fields=[]
)


class PretrainTask:
    """Next-base LM pretraining loop pieces (jit-compatible)."""

    def __init__(self, config: HyenaConfig, learning_rate: float = 6e-4, warmup_steps: int = 500):
        self.model = HyenaLM(config)
        self.config = config
        self.optimizer = make_adamw(learning_rate, 0.01, warmup_steps)

    def init_state(self, rng, example_ids: jnp.ndarray) -> PretrainState:
        params = self.model.init(rng, example_ids)["params"]
        return PretrainState(jnp.zeros((), jnp.int32), params, self.optimizer.init(params))

    def train_step(self, state: PretrainState, input_ids: jnp.ndarray, rng) -> tuple[PretrainState, jnp.ndarray]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = self.model.apply(
                {"params": params}, input_ids, deterministic=False, rngs={"dropout": step_rng}
            )
            return next_token_loss(logits, input_ids)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params, opt_state=new_opt), loss

    def jit_train_step(self):
        return jax.jit(self.train_step, donate_argnums=(0,))

    def export_backbone(self, state: PretrainState) -> dict:
        """Backbone params ready to seed ``HyenaDnaClassifier`` fine-tuning."""
        return jax.tree.map(lambda x: x, state.params["backbone"])


def seed_classifier_params(classifier_params: dict, backbone_params: dict) -> dict:
    """Replace a classifier's backbone subtree with pretrained weights."""
    out = dict(classifier_params)
    out["backbone"] = backbone_params
    return out
