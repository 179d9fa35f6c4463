"""Tree-structured Parzen Estimator (TPE) hyperparameter search.

The reference delegates sweeps to the Hydra Optuna plugin with a
``TPESampler`` (reference: configs/hparams_search/mambasp_optuna.yaml:17-52,
hyena_optuna.yaml). Optuna is not an allowed dependency here, so this module
implements the same algorithm natively:

* ``n_startup_trials`` random trials, then TPE: observed trials are split at
  the ``gamma`` quantile into good/bad sets; each numeric parameter gets a
  pair of Parzen (Gaussian-mixture) densities l(x)/g(x) and candidates drawn
  from l are ranked by the expected-improvement proxy l(x)/g(x); categorical
  parameters use weighted category frequencies the same way.
* Search-space atoms follow the Optuna sweeper grammar used by the reference
  configs: ``interval(a, b)``, ``choice(a, b, ...)``, ``range(a, b[, step])``
  — plus the dict form ``{low, high, log}`` / ``{choices}`` already used by
  the repo's YAML.

Deterministic under a fixed seed; supports maximize and minimize.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Any

import numpy as np


# -- search-space parsing ----------------------------------------------------

_INTERVAL_RE = re.compile(r"^\s*(int_)?interval\(\s*([^,]+),\s*([^)]+)\)\s*$")
_CHOICE_RE = re.compile(r"^\s*choice\((.*)\)\s*$")
_RANGE_RE = re.compile(r"^\s*range\((.*)\)\s*$")


def _scalar(token: str):
    token = token.strip()
    low = token.lower()
    if low in ("true", "false"):
        return low == "true"
    if token.startswith("[") or token.startswith("("):
        import yaml

        return yaml.safe_load(token)
    try:
        return int(token)
    except ValueError:
        pass
    try:
        return float(token)
    except ValueError:
        return token.strip("'\"")


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside brackets (choice([64,128], [256,512]) ...)."""
    parts, depth, cur = [], 0, ""
    for ch in s:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    return parts


@dataclasses.dataclass(frozen=True)
class ParamSpace:
    """One parameter's search space."""

    kind: str  # "float" | "int" | "categorical"
    low: float | None = None
    high: float | None = None
    log: bool = False
    step: float | None = None
    choices: tuple | None = None

    def sample_random(self, rng: np.random.Generator):
        if self.kind == "categorical":
            return self.choices[int(rng.integers(len(self.choices)))]
        if self.log:
            value = float(np.exp(rng.uniform(np.log(self.low), np.log(self.high))))
        else:
            value = float(rng.uniform(self.low, self.high))
        return self._finish(value)

    def _finish(self, value: float):
        if self.step:
            value = self.low + round((value - self.low) / self.step) * self.step
        value = min(max(value, self.low), self.high)
        if self.kind == "int":
            return int(round(value))
        return float(value)

    # internal numeric coordinate (log-space when log=True)
    def to_internal(self, value) -> float:
        v = float(value)
        return math.log(v) if self.log else v

    def from_internal(self, x: float):
        value = math.exp(x) if self.log else x
        return self._finish(value)

    @property
    def internal_bounds(self) -> tuple[float, float]:
        if self.log:
            return math.log(self.low), math.log(self.high)
        return float(self.low), float(self.high)


def parse_space(spec: Any) -> ParamSpace:
    """Parse a YAML space node (dict form or Optuna sweeper string form)."""
    if isinstance(spec, ParamSpace):
        return spec
    if isinstance(spec, dict):
        if "choices" in spec:
            return ParamSpace(kind="categorical", choices=tuple(spec["choices"]))
        kind = "int" if spec.get("int") else "float"
        return ParamSpace(
            kind=kind,
            low=float(spec["low"]),
            high=float(spec["high"]),
            log=bool(spec.get("log", False)),
            step=spec.get("step"),
        )
    if isinstance(spec, str):
        m = _INTERVAL_RE.match(spec)
        if m:
            kind = "int" if m.group(1) else "float"
            return ParamSpace(kind=kind, low=float(_scalar(m.group(2))), high=float(_scalar(m.group(3))))
        m = _CHOICE_RE.match(spec)
        if m:
            return ParamSpace(
                kind="categorical",
                choices=tuple(_scalar(t) for t in _split_top_level(m.group(1))),
            )
        m = _RANGE_RE.match(spec)
        if m:
            parts = [p.strip() for p in m.group(1).split(",")]
            kw = {}
            pos = []
            for p in parts:
                if "=" in p:
                    k, v = p.split("=", 1)
                    kw[k.strip()] = _scalar(v)
                else:
                    pos.append(_scalar(p))
            low, high = float(pos[0]), float(pos[1])
            step = float(kw.get("step", pos[2] if len(pos) > 2 else 1.0))
            is_int = all(float(x) == int(x) for x in (low, high, step))
            return ParamSpace(kind="int" if is_int else "float", low=low, high=high, step=step)
    # fixed value (reference configs pin some params, e.g. data.batch_size: 64)
    return ParamSpace(kind="categorical", choices=(spec,))


# -- TPE sampler -------------------------------------------------------------


@dataclasses.dataclass
class _Trial:
    params: dict
    value: float


class TPESampler:
    """Univariate TPE matching Optuna's default sampler behavior.

    reference: configs/hparams_search/mambasp_optuna.yaml:42-45
    (TPESampler, seed, n_startup_trials).
    """

    def __init__(
        self,
        space: dict[str, Any],
        seed: int = 1234,
        n_startup_trials: int = 5,
        direction: str = "maximize",
        gamma: float = 0.25,
        n_ei_candidates: int = 24,
    ):
        self.space = {k: parse_space(v) for k, v in space.items()}
        self.rng = np.random.default_rng(seed)
        self.n_startup_trials = n_startup_trials
        self.direction = direction
        self.gamma = gamma
        self.n_ei_candidates = n_ei_candidates
        self.trials: list[_Trial] = []

    # -- public API --------------------------------------------------------
    def suggest(self) -> dict:
        if len(self.trials) < self.n_startup_trials:
            return {k: sp.sample_random(self.rng) for k, sp in self.space.items()}
        good, bad = self._split()
        return {k: self._suggest_one(k, sp, good, bad) for k, sp in self.space.items()}

    def tell(self, params: dict, value: float | None) -> None:
        if value is None or not np.isfinite(value):
            return  # failed trial: ignored, like Optuna pruned/failed states
        self.trials.append(_Trial(dict(params), float(value)))

    @property
    def best(self) -> _Trial | None:
        if not self.trials:
            return None
        key = (lambda t: t.value) if self.direction == "maximize" else (lambda t: -t.value)
        return max(self.trials, key=key)

    # -- internals ----------------------------------------------------------
    def _split(self) -> tuple[list[_Trial], list[_Trial]]:
        ordered = sorted(
            self.trials, key=lambda t: -t.value if self.direction == "maximize" else t.value
        )
        n_good = max(1, int(np.ceil(self.gamma * len(ordered))))
        return ordered[:n_good], ordered[n_good:]

    def _suggest_one(self, name: str, sp: ParamSpace, good: list[_Trial], bad: list[_Trial]):
        if sp.kind == "categorical":
            return self._suggest_categorical(name, sp, good, bad)
        lo, hi = sp.internal_bounds
        if hi <= lo:
            return sp.from_internal(lo)
        xs_good = np.array([sp.to_internal(t.params[name]) for t in good if name in t.params])
        xs_bad = np.array([sp.to_internal(t.params[name]) for t in bad if name in t.params])
        if xs_good.size == 0:
            return sp.sample_random(self.rng)

        # Parzen estimator: one Gaussian per observation + a uniform prior
        # component, bandwidth ~ range / sqrt(n) (Optuna "magic clip" spirit)
        def kde(xs):
            n = xs.size
            bw = max((hi - lo) / max(np.sqrt(n), 1.0), 1e-3 * (hi - lo))
            return xs, bw

        gx, gbw = kde(xs_good)

        # sample candidates from l(x): pick a good observation, jitter by bw
        picks = self.rng.integers(0, gx.size, size=self.n_ei_candidates)
        cands = gx[picks] + self.rng.normal(0.0, gbw, size=self.n_ei_candidates)
        cands = np.clip(cands, lo, hi)

        def log_density(xs, bw, x):
            if xs.size == 0:
                return np.full_like(x, -np.log(hi - lo))
            # mixture of gaussians + uniform floor (keeps g(x) > 0 everywhere)
            z = (x[:, None] - xs[None, :]) / bw
            comp = -0.5 * z**2 - math.log(bw * math.sqrt(2 * math.pi))
            mix = np.logaddexp.reduce(comp, axis=1) - math.log(xs.size)
            floor = -math.log(hi - lo)
            return np.logaddexp(mix + math.log(0.75), floor + math.log(0.25))

        bx, bbw = kde(xs_bad) if xs_bad.size else (xs_bad, 1.0)
        score = log_density(gx, gbw, cands) - log_density(bx, bbw, cands)
        return sp.from_internal(float(cands[int(np.argmax(score))]))

    def _suggest_categorical(self, name: str, sp: ParamSpace, good: list[_Trial], bad: list[_Trial]):
        choices = sp.choices
        if len(choices) == 1:
            return choices[0]

        def weights(trials):
            w = np.ones(len(choices))  # +1 smoothing prior
            for t in trials:
                if name in t.params:
                    try:
                        w[choices.index(t.params[name])] += 1
                    except ValueError:
                        pass
            return w / w.sum()

        score = np.log(weights(good)) - np.log(weights(bad))
        probs = np.exp(score - score.max())
        probs /= probs.sum()
        return choices[int(self.rng.choice(len(choices), p=probs))]


class RandomSampler:
    """Uniform random search with the same suggest/tell interface."""

    def __init__(self, space: dict[str, Any], seed: int = 0, direction: str = "maximize", **_):
        self.space = {k: parse_space(v) for k, v in space.items()}
        self.rng = np.random.default_rng(seed)
        self.direction = direction
        self.trials: list[_Trial] = []

    def suggest(self) -> dict:
        return {k: sp.sample_random(self.rng) for k, sp in self.space.items()}

    def tell(self, params: dict, value: float | None) -> None:
        if value is None or not np.isfinite(value):
            return
        self.trials.append(_Trial(dict(params), float(value)))

    @property
    def best(self) -> _Trial | None:
        if not self.trials:
            return None
        key = (lambda t: t.value) if self.direction == "maximize" else (lambda t: -t.value)
        return max(self.trials, key=key)


def make_sampler(sweep_cfg: dict) -> TPESampler | RandomSampler:
    """Build a sampler from a ``sweep`` config node.

    Node shape (config/configs/hparams_search/optuna.yaml):
    ``{sampler: tpe|random, seed, n_startup_trials, direction, params: {...}}``.
    """
    kind = str(sweep_cfg.get("sampler", "tpe")).lower()
    kw = dict(
        seed=int(sweep_cfg.get("sampler_seed", sweep_cfg.get("seed", 1234) or 1234)),
        direction=sweep_cfg.get("direction", "maximize"),
    )
    if kind == "random":
        return RandomSampler(sweep_cfg["params"], **kw)
    kw["n_startup_trials"] = int(sweep_cfg.get("n_startup_trials", 5))
    return TPESampler(sweep_cfg["params"], **kw)
