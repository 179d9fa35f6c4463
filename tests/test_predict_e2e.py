"""End-to-end predict + filter pipeline tests on the reference BAM fixture.

The parity harness stands in for "bit-identical labels vs the reference CLI":
the torch mirror (tests/torch_mirror.py) runs the same pipeline the reference
does (stream order, batch-12, pad-to-longest, no mask), and our parity-mode
engine must produce identical labels from the converted weights.
"""

import numpy as np
import pytest

import jax

from chimeralm_tpu.data.tokenizer import CharacterTokenizer
from chimeralm_tpu.io.bam import BamReader, iter_chimeric_reads
from chimeralm_tpu.models.hyena import HyenaDnaClassifier, tiny_config
from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine
from chimeralm_tpu.runtime.writers import load_predictions_from_folder

BAM = "tests/data/test_chimric_reads.bam"


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    model = HyenaDnaClassifier(cfg)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 64), np.int32))["params"]
    return model, params


def _engine(tiny_model, mode, **kw):
    model, params = tiny_model
    tok = CharacterTokenizer(model_max_length=512, padding_side="left")
    cfg = PredictConfig(batch_size=12, mode=mode, buckets=(128, 256, 512), **kw)
    return PredictEngine(model, params, tok, cfg)


def test_fast_mode_end_to_end(tiny_model, tmp_path):
    engine = _engine(tiny_model, "fast")
    stats = engine.predict_bam(BAM, tmp_path / "pred")
    assert stats.n_reads == 100
    preds = load_predictions_from_folder(tmp_path / "pred")
    assert len(preds) == 100
    with BamReader(BAM) as r:
        names = {rec.query_name for rec in r}
    assert set(preds) == names
    assert set(preds.values()) <= {0, 1}


def test_parity_mode_end_to_end(tiny_model, tmp_path):
    engine = _engine(tiny_model, "parity")
    stats = engine.predict_bam(BAM, tmp_path / "pred")
    assert stats.n_reads == 100
    assert stats.n_batches == 9  # ceil(100/12)
    preds = load_predictions_from_folder(tmp_path / "pred")
    assert len(preds) == 100


def test_fast_mode_batching_invariance(tiny_model, tmp_path):
    """Fast-mode labels don't depend on batch size (masked pooling)."""
    a = _engine(tiny_model, "fast")
    b = _engine(tiny_model, "fast")
    b.config.batch_size = 5
    a.predict_bam(BAM, tmp_path / "a")
    b.predict_bam(BAM, tmp_path / "b")
    pa = load_predictions_from_folder(tmp_path / "a")
    pb = load_predictions_from_folder(tmp_path / "b")
    assert pa == pb


def test_sharded_predict_matches_single(tiny_model, tmp_path):
    """Striping reads over N shards reproduces the single-host labels."""
    single = _engine(tiny_model, "fast")
    single.predict_bam(BAM, tmp_path / "single")
    for shard in range(3):
        eng = _engine(tiny_model, "fast")
        eng.rank = shard
        eng.predict(
            iter_chimeric_reads(BAM),
            output_dir=tmp_path / "sharded",
            shard_index=shard,
            num_shards=3,
        )
    merged = load_predictions_from_folder(tmp_path / "sharded")
    assert merged == load_predictions_from_folder(tmp_path / "single")


@pytest.mark.slow
def test_parity_vs_torch_pipeline(tiny_model, tmp_path):
    """Parity mode reproduces the torch reference pipeline label-for-label."""
    torch = pytest.importorskip("torch")
    from tests.torch_mirror import TINY_CFG, ChimeraLMTorch

    from chimeralm_tpu.models.convert import convert_state_dict

    torch.manual_seed(7)
    tmodel = ChimeraLMTorch(TINY_CFG).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    model = HyenaDnaClassifier(tiny_config())
    params = convert_state_dict(sd)
    tok = CharacterTokenizer(model_max_length=512, padding_side="left")
    engine = PredictEngine(
        model, params, tok, PredictConfig(batch_size=12, mode="parity")
    )
    engine.predict_bam(BAM, tmp_path / "jax")
    jax_preds = load_predictions_from_folder(tmp_path / "jax")

    # torch reference pipeline: stream order, batch 12, left pad to longest
    reads = list(iter_chimeric_reads(BAM))
    torch_preds = {}
    for i in range(0, len(reads), 12):
        chunk = reads[i : i + 12]
        encoded = [tok.encode_np(r["seq"], truncation=True, max_length=tok.max_len_single_sentence) for r in chunk]
        longest = max(len(e) for e in encoded)
        ids = np.full((len(chunk), longest), 4, np.int64)
        for j, e in enumerate(encoded):
            ids[j, longest - len(e):] = e
        with torch.no_grad():
            logits = tmodel(torch.from_numpy(ids)).numpy()
        for r, label in zip(chunk, logits.argmax(1)):
            torch_preds[r["id"]] = int(label)

    assert jax_preds == torch_preds


def test_filter_cli_end_to_end(tiny_model, tmp_path):
    """predict -> filter -> sorted+indexed BAM with predicted-1 reads dropped."""
    import shutil

    from chimeralm_tpu.__main__ import filter_bam_by_prediction

    bam_copy = tmp_path / "in.bam"
    shutil.copy(BAM, bam_copy)
    engine = _engine(tiny_model, "fast")
    engine.predict_bam(bam_copy, tmp_path / "pred")
    preds = load_predictions_from_folder(tmp_path / "pred")
    filter_bam_by_prediction(bam_copy, tmp_path / "pred", output_prediction=True)

    sorted_bam = tmp_path / "in.filtered.sorted.bam"
    assert sorted_bam.exists()
    assert sorted_bam.with_suffix(".bam.bai").exists()
    assert (tmp_path / "pred" / "predictions.txt").exists()
    dropped = {n for n, l in preds.items() if l == 1}
    with BamReader(sorted_bam) as r:
        out_names = {rec.query_name for rec in r}
    assert not (out_names & dropped)
    assert len(out_names) == 100 - len(dropped)


def test_predict_with_dp_mesh(tiny_model, tmp_path):
    """Engine over a 4-device dp mesh produces the single-device labels."""
    from chimeralm_tpu.parallel.mesh import make_mesh

    model, params = tiny_model
    tok = CharacterTokenizer(model_max_length=512, padding_side="left")
    cfg = PredictConfig(batch_size=12, mode="fast", buckets=(128, 256, 512))
    single = PredictEngine(model, params, tok, cfg)
    single.predict_bam(BAM, tmp_path / "single")

    mesh = make_mesh(4, axis_names=("dp",))
    meshed = PredictEngine(model, params, tok, cfg, mesh=mesh)
    meshed.predict_bam(BAM, tmp_path / "mesh")

    a = load_predictions_from_folder(tmp_path / "single")
    b = load_predictions_from_folder(tmp_path / "mesh")
    assert a == b and len(a) == 100


class _LogitGrab:
    def __init__(self):
        self.logits = []

    def write_batch(self, logits, ids, idx, valid):
        self.logits.append(np.asarray(logits)[:valid])


def test_filter_cache_matches_uncached(tiny_model, tmp_path):
    """Per-bucket precomputed filters reproduce the in-forward filter MLP
    exactly (same ops on the same f32 values, hoisted out of the batch jit)."""
    cached = _engine(tiny_model, "fast")
    uncached = _engine(tiny_model, "fast", cache_filters=False)
    assert cached._use_filter_cache and not uncached._use_filter_cache
    ga, gb = _LogitGrab(), _LogitGrab()
    cached.predict_bam(BAM, writers=[ga], output_dir=None)
    uncached.predict_bam(BAM, writers=[gb], output_dir=None)
    assert cached._filter_cache  # at least one bucket was populated
    a = np.concatenate(ga.logits)
    b = np.concatenate(gb.logits)
    np.testing.assert_array_equal(a, b)
