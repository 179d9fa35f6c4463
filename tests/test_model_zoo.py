"""Model-zoo tests: every backbone family builds, runs, and trains."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chimeralm_tpu.models.registry import available, build
from chimeralm_tpu.ops.ssd import ssd_chunked, ssd_reference

TINY = {
    "cnn": dict(embedding_dim=16, num_filters=[8, 16], kernel_sizes=[5, 3], pool_sizes=[2, 2], hidden_dim=16),
    "transformer": dict(max_len=512, d_model=32, num_encoder_layers=1, nhead=4, dim_feedforward=64),
    "mamba": dict(embedding_dim=32, number_of_layers=1, model_max_length=256, dropout=0.1, d_state=16, headdim=16),
    "mambasp": dict(embedding_dim=32, number_of_layers=1, dropout=0.1, d_state=16, headdim=16),
    "mamba-positional": dict(embedding_dim=32, number_of_layers=1, dropout=0.1, max_seq_length=256, d_state=16, headdim=16),
    "striped-hyena": dict(seq_len=256, d_model=32, n_layers=1, num_heads=1, inner_factor=1.0),
    "hyenadna-tiny": {},
}


@pytest.mark.parametrize("name", sorted(TINY))
def test_backbone_forward(name):
    model = build(name, **TINY[name])
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 12, size=(2, 64)), jnp.int32)
    mask = jnp.ones((2, 64), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(variables, ids, attention_mask=mask)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["cnn", "transformer", "mambasp"])
def test_backbone_train_step(name):
    from chimeralm_tpu.runtime.task import ClassificationTask

    model = build(name, **TINY[name])
    task = ClassificationTask(model, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(7, 12, size=(4, 64)), jnp.int32),
        "attention_mask": jnp.ones((4, 64), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, size=(4,)), jnp.int32),
    }
    state = task.init_state(jax.random.PRNGKey(0), batch["input_ids"][:1])
    train_step, eval_step = task.jit_steps()
    losses = []
    for _ in range(12):
        state, m = train_step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # dropout makes per-step loss noisy; require clear descent somewhere
    assert min(losses[4:]) < losses[0], losses
    # eval threads batch_stats etc. through model_state
    out = eval_step(state.params, batch, state.model_state)
    assert np.isfinite(float(out["loss"]))


def test_ssd_matches_reference_recurrence():
    rng = np.random.default_rng(0)
    B, L, H, P, N = 2, 37, 2, 4, 8
    x = rng.normal(size=(B, L, H, P)).astype(np.float32)
    dt = rng.uniform(0.01, 0.2, size=(B, L, H)).astype(np.float32)
    A = -rng.uniform(0.5, 2.0, size=(H,)).astype(np.float32)
    Bm = rng.normal(size=(B, L, N)).astype(np.float32)
    Cm = rng.normal(size=(B, L, N)).astype(np.float32)
    D = rng.normal(size=(H,)).astype(np.float32)
    y_chunked = np.asarray(ssd_chunked(*(jnp.asarray(t) for t in (x, dt, A, Bm, Cm, D)), chunk=8))
    y_ref = ssd_reference(x, dt, A, Bm, Cm, D)
    np.testing.assert_allclose(y_chunked, y_ref, atol=2e-4, rtol=1e-3)


def test_flash_attention_reference_vs_pallas_interpret():
    """Pallas kernel (interpret mode on CPU) must match the jnp reference."""
    import functools

    from jax.experimental import pallas as pl

    from chimeralm_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(0)
    B, H, L, D = 2, 2, 256, 16
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, L)), jnp.int32).at[:, 0].set(1)

    ref = fa.attention_reference(q, k, v, mask)

    # run the pallas kernel in interpreter mode (no TPU needed)
    orig = pl.pallas_call
    with _interpret_pallas():
        out = fa.flash_attention_tpu(q, k, v, mask, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


import contextlib


@contextlib.contextmanager
def _interpret_pallas():
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        yield
    finally:
        pl.pallas_call = orig


def test_flash_attention_backward_matches_reference():
    """Custom-VJP Pallas backward (interpret mode) vs jnp reference grads."""
    from chimeralm_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(1)
    B, H, L, D = 2, 2, 256, 16
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, size=(B, L)), jnp.int32).at[:, 0].set(1)
    cot = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(fa.attention_reference(q, k, v, mask) * cot)

    gq_ref, gk_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    def loss_pallas(q, k, v):
        return jnp.sum(fa.flash_attention_tpu(q, k, v, mask, block_q=128, block_k=128) * cot)

    with _interpret_pallas():
        gq, gk, gv = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)

    for g, g_ref in ((gq, gq_ref), (gk, gk_ref), (gv, gv_ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-5, rtol=1e-3)


def test_flash_attention_training_step_uses_kernel():
    """A training step differentiates through flash_attention_tpu cleanly."""
    from chimeralm_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(2)
    B, H, L, D = 1, 2, 128, 8
    w = jnp.asarray(rng.normal(size=(D, D)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)

    def loss(w):
        q = x @ w
        out = fa.flash_attention_tpu(q, x, x, None, block_q=128, block_k=128)
        return jnp.mean(out**2)

    with _interpret_pallas():
        g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_registry_lists_all():
    assert set(available()) >= {"hyenadna", "cnn", "transformer", "mamba", "mambasp", "striped-hyena"}


def test_mamba_positional_variants():
    for pos_type in ("learned", "sinusoidal", "none"):
        model = build(
            "mamba-positional",
            embedding_dim=32, number_of_layers=1, dropout=0.1,
            max_seq_length=128, d_state=16, headdim=16,
            pos_embedding_type=pos_type,
        )
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 12, (2, 48)), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), ids)
        logits = model.apply(variables, ids)
        assert logits.shape == (2, 2) and np.isfinite(np.asarray(logits)).all()
