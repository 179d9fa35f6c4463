"""Edge cases: empty inputs, no-chimeric BAMs, odd read names, N-heavy reads."""

import numpy as np
import pytest

import jax

from chimeralm_tpu.data.collator import DataCollator
from chimeralm_tpu.data.tokenizer import CharacterTokenizer, encode_read_id
from chimeralm_tpu.io.bam import BamHeader, BamReader, BamWriter, bam_sort, filter_bam
from chimeralm_tpu.models.hyena import HyenaDnaClassifier, tiny_config
from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine
from chimeralm_tpu.runtime.writers import load_predictions_from_folder, resume_read_name

BAM = "tests/data/test_chimric_reads.bam"


@pytest.fixture(scope="module")
def engine():
    model = HyenaDnaClassifier(tiny_config())
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 64), np.int32))["params"]
    tok = CharacterTokenizer(model_max_length=256, padding_side="left")
    return PredictEngine(model, params, tok, PredictConfig(batch_size=4, mode="fast", buckets=(128, 256)))


def test_predict_empty_stream(engine, tmp_path):
    stats = engine.predict(iter([]), output_dir=tmp_path)
    assert stats.n_reads == 0
    assert load_predictions_from_folder(tmp_path) == {}


def test_predict_single_read(engine, tmp_path):
    stats = engine.predict(iter([{"id": "only", "seq": "ACGT" * 10}]), output_dir=tmp_path)
    assert stats.n_reads == 1
    assert set(load_predictions_from_folder(tmp_path)) == {"only"}


def test_predict_n_heavy_and_short_reads(engine, tmp_path):
    reads = [
        {"id": "nn", "seq": "N" * 100},
        {"id": "tiny", "seq": "A"},
        {"id": "mixed", "seq": "ACGTN" * 50},
    ]
    stats = engine.predict(iter(reads), output_dir=tmp_path)
    assert stats.n_reads == 3
    assert set(load_predictions_from_folder(tmp_path)) == {"nn", "tiny", "mixed"}


def test_long_read_name_sidecar():
    name = "x" * 300  # longer than the 256-slot sidecar
    packed = encode_read_id(name)
    assert len(packed) == 256
    # int8 wrap of the length byte, same as the reference's torch int8 cast:
    # 300 wraps to 44, so 44 chars come back (documented reference behavior)
    as_int8 = np.asarray(packed, np.int64).astype(np.int8)
    assert resume_read_name(as_int8) == "x" * 44


def test_empty_bam_roundtrip(tmp_path):
    header = BamHeader("@HD\tVN:1.6\n", [("chr1", 1000)])
    p = tmp_path / "empty.bam"
    with BamWriter(p, header):
        pass
    with BamReader(p) as r:
        assert list(r) == []
        assert r.header.refs == [("chr1", 1000)]
    # filter/sort of an empty BAM are no-ops, not crashes
    kept, dropped = filter_bam(p, {"x": 1}, tmp_path / "f.bam")
    assert (kept, dropped) == (0, 0)
    bam_sort(p, tmp_path / "s.bam")
    with BamReader(tmp_path / "s.bam") as r:
        assert list(r) == []


def test_collator_empty_features():
    tok = CharacterTokenizer(model_max_length=64)
    assert DataCollator(tok)([]) == {}


def test_tokenizer_empty_sequence():
    tok = CharacterTokenizer(model_max_length=64)
    assert tok.encode("") == [0, 1]


def test_native_tokenizer_no_chimeric(tmp_path):
    """A BAM whose records lack SA tags yields zero reads, cleanly."""
    from chimeralm_tpu.io import native

    if not native.available():
        pytest.skip("native lib not built")
    # strip SA-tagged records by rewriting only... simplest: write header-only BAM
    header = BamHeader("@HD\tVN:1.6\n", [("chr1", 1000)])
    p = tmp_path / "none.bam"
    with BamWriter(p, header):
        pass
    with native.NativeBamTokenizer(p, max_len=128) as nt:
        assert list(nt) == []


def test_unknown_chars_map_to_unk(engine, tmp_path):
    stats = engine.predict(iter([{"id": "weird", "seq": "ACGTRYKM"}]), output_dir=tmp_path)
    assert stats.n_reads == 1
