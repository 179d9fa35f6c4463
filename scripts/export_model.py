"""Export a trained checkpoint to a distributable model directory.

Reference: scripts/model2hub.py pushed the Lightning ckpt to the HF hub;
this framework has no network, so the equivalent is a local export that
``ChimeraLM.from_pretrained`` (and a CHIMERALM_CHECKPOINT_DIR mirror) can
load: ``flax_params.msgpack`` + ``config.json`` + a torch-key
``model.safetensors`` for interop with the reference ecosystem.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def export(ckpt_path: str, out_dir: str, with_safetensors: bool = True) -> Path:
    import jax
    import numpy as np

    from chimeralm_tpu.models.hyena import HyenaDnaClassifier, small_32k_config
    from chimeralm_tpu.models.lm import ChimeraLM, LoadedModel, save_pretrained
    from chimeralm_tpu.runtime.task import ClassificationTask
    from chimeralm_tpu.runtime.trainer import Trainer

    ckpt_path = Path(ckpt_path)
    if ckpt_path.name.endswith(".ckpt.msgpack"):
        config = small_32k_config()
        model = HyenaDnaClassifier(config)
        task = ClassificationTask(model)
        state = task.init_state(jax.random.PRNGKey(0), np.zeros((1, 64), np.int32))
        state, _ = Trainer(task).load_checkpoint(state, ckpt_path)
        loaded = LoadedModel(model, state.params, config)
    else:
        loaded = ChimeraLM.from_pretrained(ckpt_path)

    out = save_pretrained(loaded, out_dir)
    if with_safetensors:
        _export_safetensors(loaded.params, Path(out_dir) / "model.safetensors")
    print(out)
    return out


def _export_safetensors(params, path: Path) -> None:
    """Write torch-remote-code key names (inverse of convert.py's mapping)."""
    import numpy as np
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                flat[name] = np.asarray(v)

    walk(params, "")
    out: dict[str, np.ndarray] = {}
    for name, arr in flat.items():
        torch_name = (
            name.replace("backbone.word_embeddings.embedding", "backbone.embeddings.word_embeddings.weight")
            .replace("backbone.layers_", "backbone.layers.")
        )
        torch_name = torch_name.replace("short_filter_weight", "short_filter.weight")
        torch_name = torch_name.replace("short_filter_bias", "short_filter.bias")
        torch_name = torch_name.replace("implicit_filter_", "implicit_filter.")
        torch_name = torch_name.replace("attention_0", "attention.0").replace("attention_2", "attention.2")
        torch_name = torch_name.replace("classifier_0", "classifier.0").replace("classifier_3", "classifier.3")
        torch_name = torch_name.replace("classifier_6", "classifier.6")
        torch_name = torch_name.replace("layers_0", "layers.0").replace("layers_3", "layers.3")
        if torch_name.endswith(".kernel"):
            torch_name = torch_name[: -len(".kernel")] + ".weight"
            if arr.ndim == 2:
                arr = arr.T
        if torch_name.endswith(".scale"):
            torch_name = torch_name[: -len(".scale")] + ".weight"
        # HyenaDna wraps AutoModel (whose own top module is `backbone`):
        # flax `backbone.` == torch `backbone.backbone.`
        if torch_name.startswith("backbone."):
            torch_name = "backbone." + torch_name
        out["net." + torch_name] = np.ascontiguousarray(arr)
    save_file(out, str(path))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt_path")
    p.add_argument("out_dir")
    p.add_argument("--no-safetensors", action="store_true")
    a = p.parse_args(argv)
    export(a.ckpt_path, a.out_dir, with_safetensors=not a.no_safetensors)


if __name__ == "__main__":
    main()
