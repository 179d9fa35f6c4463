"""The committed demo checkpoint (TPU-trained) loads and classifies correctly."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

DEMO = Path("demo/checkpoint")


@pytest.mark.skipif(not DEMO.exists(), reason="demo checkpoint not present")
def test_demo_checkpoint_predicts_synthetic_chimeras(tmp_path):
    import make_synthetic_dataset as synth

    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.models.lm import ChimeraLM
    from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine
    from chimeralm_tpu.runtime.writers import load_predictions_from_folder

    loaded = ChimeraLM.from_pretrained(DEMO)
    assert loaded.config.d_model == 64

    rng = np.random.default_rng(99)  # held-out seed
    reads, labels = [], {}
    for i in range(60):
        label = i % 2
        seq = synth.make_read(rng, chimeric=bool(label), min_len=200, max_len=480)
        reads.append({"id": f"held_{i}", "seq": seq})
        labels[f"held_{i}"] = label

    tok = CharacterTokenizer(model_max_length=512, padding_side="left")
    engine = PredictEngine(
        loaded.model, loaded.params, tok, PredictConfig(batch_size=16, mode="fast", buckets=(512,))
    )
    engine.predict(iter(reads), output_dir=tmp_path)
    preds = load_predictions_from_folder(tmp_path)
    acc = sum(preds[k] == labels[k] for k in labels) / len(labels)
    assert acc >= 0.95, acc
