"""TPE sweeper tests (reference surface: configs/hparams_search/*_optuna.yaml)."""

import numpy as np
import pytest

from chimeralm_tpu.runtime.hparam import (
    ParamSpace,
    RandomSampler,
    TPESampler,
    make_sampler,
    parse_space,
)


class TestParseSpace:
    def test_dict_float_log(self):
        sp = parse_space({"low": 1e-5, "high": 1e-3, "log": True})
        assert sp.kind == "float" and sp.log

    def test_dict_choices(self):
        sp = parse_space({"choices": [12, 24, 48]})
        assert sp.kind == "categorical" and sp.choices == (12, 24, 48)

    def test_optuna_interval(self):
        # reference: hyena_optuna.yaml "interval(0.0001, 0.1)"
        sp = parse_space("interval(0.0001, 0.1)")
        assert sp.kind == "float" and sp.low == 0.0001 and sp.high == 0.1

    def test_optuna_choice(self):
        # reference: hyena_optuna.yaml "choice(128, 256, 1024)"
        sp = parse_space("choice(128, 256, 1024)")
        assert sp.choices == (128, 256, 1024)

    def test_optuna_choice_bool(self):
        sp = parse_space("choice(false, true)")
        assert sp.choices == (False, True)

    def test_optuna_choice_nested_lists(self):
        # reference: cnn_optuna.yaml "choice([64, 128, 64], [64, 128, 256], ...)"
        sp = parse_space("choice([64, 128, 64], [64, 128, 256], [128, 256, 512])")
        assert sp.choices == ([64, 128, 64], [64, 128, 256], [128, 256, 512])
        rng = np.random.default_rng(0)
        assert sp.sample_random(rng) in sp.choices

    def test_optuna_range_step(self):
        # reference: mambasp_optuna.yaml "range(0.1, 0.8, step=0.1)"
        sp = parse_space("range(0.1, 0.8, step=0.1)")
        assert sp.kind == "float" and sp.step == pytest.approx(0.1)
        rng = np.random.default_rng(0)
        vals = {round(sp.sample_random(rng), 10) for _ in range(100)}
        assert all(abs((v - 0.1) / 0.1 - round((v - 0.1) / 0.1)) < 1e-9 for v in vals)

    def test_fixed_value(self):
        # reference pins e.g. data.batch_size: 64
        sp = parse_space(64)
        assert sp.choices == (64,)

    def test_int_range(self):
        sp = parse_space("range(1, 8)")
        rng = np.random.default_rng(0)
        assert all(isinstance(sp.sample_random(rng), int) for _ in range(20))


class TestTPESampler:
    def _quadratic(self, params):
        # maximum at lr=1e-3 (log-space), batch=24
        lr_term = -((np.log10(params["lr"]) + 3.0) ** 2)
        b_term = -0.5 * (params["batch"] != 24)
        return lr_term + b_term

    def test_tpe_concentrates_near_optimum(self):
        space = {"lr": {"low": 1e-5, "high": 1e-1, "log": True}, "batch": {"choices": [12, 24, 48]}}
        tpe = TPESampler(space, seed=7, n_startup_trials=5)
        for _ in range(30):
            p = tpe.suggest()
            tpe.tell(p, self._quadratic(p))
        # found a near-optimal point (optimum: lr=1e-3, batch=24 -> value 0)
        assert tpe.best.value > -0.25
        # ... and concentrates samples near the optimum in later trials
        late = [t.params["lr"] for t in tpe.trials[-10:]]
        assert np.median(np.abs(np.log10(late) + 3.0)) < 1.0

    def test_deterministic_under_seed(self):
        space = {"x": {"low": 0.0, "high": 1.0}}
        a, b = (TPESampler(space, seed=3, n_startup_trials=2) for _ in range(2))
        for _ in range(10):
            pa, pb = a.suggest(), b.suggest()
            assert pa == pb
            a.tell(pa, -abs(pa["x"] - 0.7))
            b.tell(pb, -abs(pb["x"] - 0.7))

    def test_failed_trials_ignored(self):
        tpe = TPESampler({"x": {"low": 0.0, "high": 1.0}}, seed=0, n_startup_trials=2)
        p = tpe.suggest()
        tpe.tell(p, None)
        tpe.tell(p, float("nan"))
        assert tpe.best is None and len(tpe.trials) == 0

    def test_minimize_direction(self):
        tpe = TPESampler({"x": {"low": 0.0, "high": 1.0}}, seed=0, n_startup_trials=3, direction="minimize")
        for _ in range(25):
            p = tpe.suggest()
            tpe.tell(p, (p["x"] - 0.2) ** 2)
        assert abs(tpe.best.params["x"] - 0.2) < 0.15

    def test_bounds_respected(self):
        tpe = TPESampler({"x": {"low": 2.0, "high": 3.0}}, seed=1, n_startup_trials=3)
        for _ in range(20):
            p = tpe.suggest()
            assert 2.0 <= p["x"] <= 3.0
            tpe.tell(p, p["x"])


def test_make_sampler_kinds():
    cfg = {"sampler": "tpe", "n_startup_trials": 5, "params": {"x": {"low": 0, "high": 1}}}
    assert isinstance(make_sampler(cfg), TPESampler)
    cfg["sampler"] = "random"
    assert isinstance(make_sampler(cfg), RandomSampler)


def test_run_sweep_via_train_entry(tmp_path):
    """End-to-end: hparams_search config drives a TPE sweep through train()."""
    import train as train_entry

    calls = []
    orig_train = train_entry.train

    def fake_train(cfg):
        lr = float(cfg["model"]["learning_rate"])
        calls.append(lr)
        return {"val/f1_best": -(np.log10(lr) + 4.0) ** 2}, {}

    train_entry.train = fake_train
    try:
        cfg = {
            "sweep": {
                "sampler": "tpe",
                "sampler_seed": 1,
                "n_startup_trials": 3,
                "n_trials": 8,
                "direction": "maximize",
                "metric": "val/f1_best",
                "params": {"model.learning_rate": {"low": 1e-6, "high": 1e-2, "log": True}},
            }
        }
        best = train_entry.run_sweep(cfg, [])
    finally:
        train_entry.train = orig_train
    assert len(calls) == 8
    assert best == pytest.approx(max(-(np.log10(lr) + 4.0) ** 2 for lr in calls))
