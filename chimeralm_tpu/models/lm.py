"""ChimeraLM model factory: the production HyenaDNA+head classifier.

Mirrors the reference factory (reference: chimeralm/models/lm.py:9-61):
``from_pretrained`` loads the published hyperparameters
(hyenadna-small-32k backbone, attention-pooled 512-wide head) with weights
from a local checkpoint; ``new`` random-initializes the same graph.

Checkpoint sources accepted by ``from_pretrained``:

* a directory containing ``flax_params.msgpack`` (+ optional ``config.json``)
  written by :func:`save_pretrained`;
* a ``.safetensors`` / ``.pt`` / ``.bin`` / ``.ckpt`` torch checkpoint with
  ``yangliz5/chimeralm``-style keys, converted on the fly
  (``chimeralm_tpu.models.convert``).

There is no network access in this framework: hub names are resolved only
through ``CHIMERALM_CHECKPOINT_DIR`` (a local mirror of downloaded weights).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from chimeralm_tpu.models.hyena import HyenaConfig, HyenaDnaClassifier, small_32k_config


@dataclasses.dataclass
class LoadedModel:
    model: HyenaDnaClassifier
    params: dict
    config: HyenaConfig

    @property
    def apply(self):
        return self.model.apply

    def param_count(self) -> int:
        return sum(int(np.size(x)) for x in jax.tree.leaves(self.params))


#: held-out F1 a demo export must clear to serve as the default predict model
#: (the reference's production bar: val F1 0.9347, scripts/run_eval.sh:30)
F1_GATE = 0.93


def _meets_f1_gate(ckpt_dir: Path) -> bool:
    """True iff the export's meta.json records a held-out test F1 >= F1_GATE."""
    meta_file = ckpt_dir / "meta.json"
    if not meta_file.exists():
        return False
    try:
        meta = json.loads(meta_file.read_text())
        f1 = meta["results"]["test"]["test/f1"]
        return float(f1) >= F1_GATE
    except (KeyError, TypeError, ValueError, json.JSONDecodeError):
        return False


def _config_from_json(path: Path) -> HyenaConfig:
    raw = json.loads(path.read_text())
    fields = {f.name for f in dataclasses.fields(HyenaConfig)}
    return HyenaConfig(**{k: v for k, v in raw.items() if k in fields})


def _config_to_json(config: HyenaConfig) -> str:
    d = dataclasses.asdict(config)
    d.pop("dtype", None)
    return json.dumps(d, indent=2)


class ChimeraLM:
    """Factory for the flagship classifier (reference: lm.py:9-61)."""

    DEFAULT_NAME = "yangliz5/chimeralm"

    @classmethod
    def new(cls, seed: int = 0, config: HyenaConfig | None = None, example_len: int = 128) -> LoadedModel:
        config = config or small_32k_config()
        model = HyenaDnaClassifier(config)
        params = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, example_len), jnp.int32)
        )["params"]
        return LoadedModel(model, params, config)

    @classmethod
    def from_pretrained(cls, name_or_path: str | Path = DEFAULT_NAME, config: HyenaConfig | None = None) -> LoadedModel:
        path = cls._resolve(name_or_path)
        if path.is_dir():
            cfg_file = path / "config.json"
            if config is None and cfg_file.exists():
                config = _config_from_json(cfg_file)
            msgpack_file = path / "flax_params.msgpack"
            if msgpack_file.exists():
                return cls._load_flax(msgpack_file, config)
            for pattern in ("*.safetensors", "*.ckpt", "*.pt", "*.bin"):
                hits = sorted(path.glob(pattern))
                if hits:
                    return cls._load_torch(hits[0], config)
            raise FileNotFoundError(f"no checkpoint found under {path}")
        if path.suffix == ".msgpack":
            return cls._load_flax(path, config)
        return cls._load_torch(path, config)

    # -- internals ---------------------------------------------------------
    @staticmethod
    def _resolve(name_or_path: str | Path) -> Path:
        path = Path(name_or_path)
        if path.exists():
            return path
        mirror = os.environ.get("CHIMERALM_CHECKPOINT_DIR")
        if mirror:
            candidate = Path(mirror) / str(name_or_path).replace("/", "--")
            if candidate.exists():
                return candidate
        # in-framework trained flagship (scripts/train_flagship.py export):
        # the default model when the hub name has no local mirror — longest
        # trained context wins.  A candidate only qualifies if its meta.json
        # records a held-out test F1 >= 0.93 (so an ungated or partially
        # trained local export can never silently become the production
        # predict model).
        if str(name_or_path) == ChimeraLM.DEFAULT_NAME:
            demo = Path(__file__).resolve().parents[2] / "demo"
            for name in ("flagship32k", "flagship16k", "flagship"):
                flagship = demo / name
                if (flagship / "flax_params.msgpack").exists() and _meets_f1_gate(flagship):
                    return flagship
        raise FileNotFoundError(
            f"checkpoint {name_or_path!r} not found locally; this framework has no "
            "network access — set CHIMERALM_CHECKPOINT_DIR to a local mirror"
        )

    @classmethod
    def _load_flax(cls, msgpack_file: Path, config: HyenaConfig | None) -> LoadedModel:
        import flax.serialization

        config = config or small_32k_config()
        template = cls.new(config=config, example_len=64)
        params = flax.serialization.from_bytes(template.params, msgpack_file.read_bytes())
        return LoadedModel(template.model, params, config)

    @classmethod
    def _load_torch(cls, ckpt_file: Path, config: HyenaConfig | None) -> LoadedModel:
        from chimeralm_tpu.models.convert import convert_checkpoint

        config = config or small_32k_config()
        model = HyenaDnaClassifier(config)
        params = convert_checkpoint(ckpt_file)
        params = jax.tree.map(jnp.asarray, params)
        return LoadedModel(model, params, config)


def save_pretrained(loaded: LoadedModel, out_dir: str | Path) -> Path:
    """Write a local checkpoint directory loadable by ``from_pretrained``."""
    import flax.serialization

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "flax_params.msgpack").write_bytes(
        flax.serialization.to_bytes(jax.tree.map(np.asarray, loaded.params))
    )
    (out_dir / "config.json").write_text(_config_to_json(loaded.config))
    return out_dir
