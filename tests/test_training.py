"""Training stack tests: loss, metrics, optimizer step, multi-device sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chimeralm_tpu.models.hyena import HyenaDnaClassifier, tiny_config
from chimeralm_tpu.runtime.metrics import ConfusionCounts, MeanState
from chimeralm_tpu.runtime.optim import EarlyStopping, ReduceLROnPlateau
from chimeralm_tpu.runtime.task import ClassificationTask, cross_entropy_loss


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 1.0], [0.5, 1.5], [1.0, 1.0]])
    labels = jnp.asarray([0, 1, -1])  # last row ignored
    loss = cross_entropy_loss(logits, labels)
    p0 = np.exp(2.0) / (np.exp(2.0) + np.exp(1.0))
    p1 = np.exp(1.5) / (np.exp(0.5) + np.exp(1.5))
    expected = -(np.log(p0) + np.log(p1)) / 2
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_confusion_counts_f1():
    preds = jnp.asarray([1, 1, 0, 0, 1, 0])
    targets = jnp.asarray([1, 0, 1, 0, 1, -100])
    c = ConfusionCounts.zero().update(preds, targets)
    assert (float(c.tp), float(c.fp), float(c.fn), float(c.tn)) == (2, 1, 1, 1)
    np.testing.assert_allclose(float(c.f1()), 2 * 2 / (2 * 2 + 1 + 1))
    np.testing.assert_allclose(float(c.precision()), 2 / 3)
    np.testing.assert_allclose(float(c.recall()), 2 / 3)


def test_mean_state():
    m = MeanState.zero().update(2.0).update(4.0)
    assert float(m.compute()) == 3.0


def test_plateau_scheduler():
    s = ReduceLROnPlateau(lr=1e-4, patience=2, factor=0.1)
    assert s.step(1.0) == 1e-4
    assert s.step(0.5) == 1e-4  # improved
    s.step(0.6)
    s.step(0.6)
    lr = s.step(0.6)  # 3rd bad epoch > patience => reduce
    np.testing.assert_allclose(lr, 1e-5)


def test_early_stopping():
    es = EarlyStopping(patience=2, mode="max")
    assert not es.step(0.5)
    assert not es.step(0.4)
    assert es.step(0.4)


def test_train_step_reduces_loss():
    model = HyenaDnaClassifier(tiny_config())
    task = ClassificationTask(model, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    B, L = 8, 64
    batch = {
        "input_ids": jnp.asarray(rng.integers(7, 12, size=(B, L)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, size=(B,)), jnp.int64),
    }
    state = task.init_state(jax.random.PRNGKey(0), batch["input_ids"][:1])
    train_step, eval_step = task.jit_steps()
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(30):
        state, metrics = train_step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    ev = eval_step(state.params, batch)
    assert np.isfinite(float(ev["loss"]))


@pytest.mark.nightly
def test_dryrun_multichip_8dev():
    """The driver's multi-chip validation path on the 8-device CPU mesh."""
    import __graft_entry__

    assert len(jax.devices()) == 8
    __graft_entry__.dryrun_multichip(8)


def test_dp_sharded_training_matches_single_device():
    """Same batch, 1 device vs 4-device dp mesh: identical loss trajectory."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chimeralm_tpu.parallel.mesh import make_mesh

    model = HyenaDnaClassifier(tiny_config())
    task = ClassificationTask(model, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    B, L = 8, 64
    np_batch = {
        "input_ids": rng.integers(7, 12, size=(B, L)).astype(np.int32),
        "labels": rng.integers(0, 2, size=(B,)).astype(np.int64),
    }

    def run(mesh):
        if mesh is None:
            batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
            state = task.init_state(jax.random.PRNGKey(0), batch["input_ids"][:1])
        else:
            sh = NamedSharding(mesh, P("dp"))
            batch = {k: jax.device_put(v, sh) for k, v in np_batch.items()}
            state = task.sharded_state(jax.random.PRNGKey(0), jnp.zeros((1, L), jnp.int32), mesh)
        train_step, _ = task.jit_steps()
        out = []
        for _ in range(3):
            state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
            out.append(float(metrics["loss"]))
        return out

    single = run(None)
    mesh = make_mesh(4, axis_names=("dp",))
    multi = run(mesh)
    np.testing.assert_allclose(single, multi, rtol=2e-4)


def test_remat_training_matches_no_remat():
    """jax.checkpoint (remat) must not change the loss trajectory."""
    model = HyenaDnaClassifier(tiny_config())
    rng = np.random.default_rng(4)
    batch = {
        "input_ids": jnp.asarray(rng.integers(7, 12, size=(4, 64)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, size=(4,)), jnp.int32),
    }

    def run(remat):
        task = ClassificationTask(model, learning_rate=1e-3, remat=remat)
        state = task.init_state(jax.random.PRNGKey(0), batch["input_ids"][:1])
        step, _ = task.jit_steps()
        losses = []
        for _ in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(m["loss"]))
        return losses

    np.testing.assert_allclose(run(False), run(True), rtol=1e-5)


def test_warmup_ramps_update_magnitude():
    from chimeralm_tpu.runtime.optim import make_adamw, set_learning_rate

    opt = make_adamw(1e-2, 0.0, warmup_steps=10)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((4,))}
    u1, state = opt.update(grads, state, params)
    for _ in range(20):
        u_last, state = opt.update(grads, state, params)
    # first step scaled to 1/10, post-warmup full magnitude
    assert abs(float(u1["w"][0])) < abs(float(u_last["w"][0])) * 0.2
    # plateau-LR injection still reachable through the chain
    state = set_learning_rate(state, 1e-3)
    u2, _ = opt.update(grads, state, params)
    assert abs(float(u2["w"][0])) < abs(float(u_last["w"][0]))


def test_grouped_optimizer_head_lr_scale():
    from chimeralm_tpu.runtime.optim import make_adamw_grouped, set_learning_rate

    opt = make_adamw_grouped(1e-3, 0.0, filter_lr_scale=0.5, head_lr_scale=10.0)
    params = {
        "backbone": {"layers_0": {"mixer": {"filter_fn": {"freq": jnp.ones((4,))},
                                            "in_proj": {"kernel": jnp.ones((4,))}}}},
        "head": {"attention_0": {"kernel": jnp.ones((4,))}},
    }
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    u, state = opt.update(grads, state, params)
    backbone_u = abs(float(u["backbone"]["layers_0"]["mixer"]["in_proj"]["kernel"][0]))
    filter_u = abs(float(u["backbone"]["layers_0"]["mixer"]["filter_fn"]["freq"][0]))
    head_u = abs(float(u["head"]["attention_0"]["kernel"][0]))
    assert head_u > backbone_u * 5, (head_u, backbone_u)
    assert filter_u < backbone_u * 0.8, (filter_u, backbone_u)
    # plateau injection preserves the per-group ratios
    state = set_learning_rate(state, 1e-4)
    u2, _ = opt.update(grads, state, params)
    head_u2 = abs(float(u2["head"]["attention_0"]["kernel"][0]))
    backbone_u2 = abs(float(u2["backbone"]["layers_0"]["mixer"]["in_proj"]["kernel"][0]))
    assert head_u2 > backbone_u2 * 5, (head_u2, backbone_u2)


def test_pretrain_next_base_lm_and_seed_classifier():
    """Causal LM pretraining descends, and its backbone seeds the classifier."""
    from chimeralm_tpu.models.hyena import tiny_config
    from chimeralm_tpu.runtime.pretrain import (
        PretrainTask,
        next_token_loss,
        seed_classifier_params,
    )

    cfg = tiny_config(embed_dropout=0.0)
    pre = PretrainTask(cfg, learning_rate=1e-3, warmup_steps=5)
    rng = np.random.default_rng(0)
    # learnable structure: repeated ACGT pattern
    ids = np.tile(np.array([7, 8, 9, 10] * 16, np.int32), (8, 1))
    state = pre.init_state(jax.random.PRNGKey(0), jnp.asarray(ids[:1]))
    step = pre.jit_train_step()
    losses = []
    for _ in range(40):
        state, loss = step(state, jnp.asarray(ids), jax.random.PRNGKey(1))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, losses[::10]

    # backbone transplant into the classifier
    backbone = pre.export_backbone(state)
    clf = HyenaDnaClassifier(cfg)
    clf_params = clf.init(jax.random.PRNGKey(0), jnp.asarray(ids[:1]))["params"]
    seeded = seed_classifier_params(clf_params, backbone)
    logits = clf.apply({"params": seeded}, jnp.asarray(ids[:2]))
    assert np.isfinite(np.asarray(logits)).all()
