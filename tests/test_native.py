"""Native C++ layer tests: build, tokenizer parity, filter, CLI tools."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from chimeralm_tpu.io import native
from chimeralm_tpu.io.bam import BamReader, iter_chimeric_reads

BAM = "tests/data/test_chimric_reads.bam"
TOOLS = Path("tools/build")


@pytest.fixture(scope="module", autouse=True)
def ensure_built():
    if not native.available() and not native.build():
        pytest.skip("native toolchain unavailable")


def test_native_tokenizer_matches_python():
    from chimeralm_tpu.data.tokenizer import CharacterTokenizer, encode_read_id

    tok = CharacterTokenizer(model_max_length=32768)
    max_len = tok.max_len_single_sentence

    py = []
    for read in iter_chimeric_reads(BAM):
        ids = tok.encode_np(read["seq"], truncation=True, max_length=max_len)
        sc = np.asarray(encode_read_id(read["id"]), np.int64).astype(np.int8)
        py.append((ids, sc))

    with native.NativeBamTokenizer(BAM, max_len=max_len) as nt:
        nat = [(ids, sc) for ids, sc in nt]

    assert len(nat) == len(py) == 100
    for (a_ids, a_sc), (b_ids, b_sc) in zip(nat, py):
        np.testing.assert_array_equal(a_ids, b_ids)
        np.testing.assert_array_equal(a_sc, b_sc)


def test_native_tokenizer_truncation():
    with native.NativeBamTokenizer(BAM, max_len=500) as nt:
        lens = [len(ids) for ids, _ in nt]
    assert max(lens) == 500
    assert len(lens) == 100


def test_native_filter_matches_python(tmp_path):
    names = [r["id"] for r in iter_chimeric_reads(BAM)]
    drop = set(names[:13])
    kept, dropped = native.filter_bam_native(BAM, tmp_path / "f.bam", drop)
    assert (kept, dropped) == (87, 13)
    with BamReader(tmp_path / "f.bam") as r:
        out_names = {rec.query_name for rec in r}
    assert not (out_names & drop)
    assert len(out_names) == 87


def test_native_extract_sa(tmp_path):
    n = native.extract_sa_native(BAM, tmp_path / "x.bam", max_reads=17)
    assert n == 17
    with BamReader(tmp_path / "x.bam") as r:
        assert len(list(r)) == 17


def test_cli_tools_annotate_roundtrip(tmp_path):
    import shutil

    clean = tmp_path / "clean.bam"
    dirty = tmp_path / "dirty.bam"
    shutil.copy(BAM, clean)
    shutil.copy(BAM, dirty)
    out = subprocess.run(
        [
            str(TOOLS / "annotate"),
            "--cbam", str(clean), "--dbam", str(dirty),
            "--ovr-threshold", "1000", "-t", "4", "--output-chimeric-events",
        ],
        capture_output=True, text=True, cwd=".",
    )
    assert out.returncode == 0, out.stderr
    sup = (tmp_path / "dirty.threshold_1000.sup.txt").read_text().strip().splitlines()
    assert len(sup) == 100
    # identical BAMs: every dirty event is supported by the clean BAM
    assert all(line.split("\t")[1] == "1" for line in sup)

    # compare validates the emitted events file
    out = subprocess.run(
        [str(TOOLS / "compare"), str(tmp_path / "clean.chimeric_events.txt")],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr

    # summary aggregates support counts
    out = subprocess.run(
        [str(TOOLS / "summary"), str(tmp_path / "dirty.threshold_1000.sup.txt"),
         "-o", str(tmp_path / "sum")],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    import json

    data = json.loads((tmp_path / "sum.json").read_text())
    assert len(data) == 100 and set(data.values()) == {1}


def test_cli_getsvfromvcf_and_annotatesv(tmp_path):
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "chr1\t100\tid1\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=200;RNAMES=readA,readB\n"
        "chr2\t500\tid2\tN\t<INS>\t.\tPASS\tSVTYPE=INS;END=600;RNAMES=readB\n"
    )
    out = subprocess.run([str(TOOLS / "getsvfromvcf"), str(vcf)], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    lines = sorted((tmp_path / "t.vcf.sv.read.sup.txt").read_text().strip().splitlines())
    assert lines == ["readA\tDEL", "readB\tDEL", "readB\tINS"]

    out = subprocess.run(
        [str(TOOLS / "annotatesv"), "--cvcf", str(vcf), "--dvcf", str(vcf), "--threshold", "10"],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    tsv = (tmp_path / "t.annotated_sv_10.tsv").read_text().strip().splitlines()
    assert len(tsv) == 3 and tsv[0].startswith("dirty_sv")


def test_cli_addtarget(tmp_path):
    from chimeralm_tpu.io.fastq import read_fastq

    recs = list(read_fastq("tests/data/test.fastq"))
    (tmp_path / "pos.txt").write_text(recs[0].name + "\n")
    (tmp_path / "neg.txt").write_text(recs[1].name + "\n")
    out = subprocess.run(
        [
            str(Path.cwd() / "tools/build/addtarget"),
            "--fq", str(Path.cwd() / "tests/data/test.fastq"),
            "--pos", "pos.txt", "--neg", "neg.txt",
        ],
        capture_output=True, text=True, cwd=tmp_path,
    )
    assert out.returncode == 0, out.stderr
    labeled = list(read_fastq(tmp_path / "test.target.fq.gz"))
    assert labeled[0].name == recs[0].name + "|1"
    assert labeled[1].name == recs[1].name + "|0"
    assert labeled[2].name == recs[2].name


def test_predict_engine_uses_native(tmp_path):
    """predict_bam(use_native=True) produces the same labels as pure-Python."""
    import jax

    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.models.hyena import HyenaDnaClassifier, tiny_config
    from chimeralm_tpu.runtime.predictor import PredictConfig, PredictEngine
    from chimeralm_tpu.runtime.writers import load_predictions_from_folder

    model = HyenaDnaClassifier(tiny_config())
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 64), np.int32))["params"]
    tok = CharacterTokenizer(model_max_length=512, padding_side="left")
    cfg = PredictConfig(batch_size=12, mode="fast", buckets=(128, 256, 512))

    eng = PredictEngine(model, params, tok, cfg)
    eng.predict_bam(BAM, tmp_path / "native", use_native=True)
    eng.predict_bam(BAM, tmp_path / "python", use_native=False)
    a = load_predictions_from_folder(tmp_path / "native")
    b = load_predictions_from_folder(tmp_path / "python")
    assert a == b and len(a) == 100


@pytest.mark.slow
def test_native_reads_python_written_bam_stress(tmp_path):
    """A large Python-written BAM (multi-block, >64KB records span) reads
    identically through the native tokenizer."""
    import struct

    from chimeralm_tpu.data.tokenizer import CharacterTokenizer
    from chimeralm_tpu.io.bam import BamHeader, BamRecord, BamWriter

    rng = np.random.default_rng(0)
    header = BamHeader("@HD\tVN:1.6\n", [("chr1", 10_000_000)])
    p = tmp_path / "big.bam"
    names, seqs = [], []
    nib = "=ACMGRSVTWYHKDBN"
    with BamWriter(p, header) as w:
        for i in range(500):
            name = f"read_{i:05d}"
            L = int(rng.integers(50, 5000))
            seq_idx = rng.integers(0, 4, L)  # A C M G nibbles? use ACGT codes 1,2,4,8
            codes = [1, 2, 4, 8]
            seq = "".join("ACGT"[j] for j in seq_idx)
            packed = bytearray()
            for j in range(0, L, 2):
                hi = codes[seq_idx[j]] << 4
                lo = codes[seq_idx[j + 1]] if j + 1 < L else 0
                packed.append(hi | lo)
            raw = bytearray()
            raw += struct.pack("<iiBBHHHiiii", 0, i * 10, len(name) + 1, 60, 0, 1, 0, L, -1, -1, 0)
            raw += name.encode() + b"\x00"
            raw += struct.pack("<I", (L << 4) | 0)  # cigar: L M
            raw += bytes(packed)
            raw += bytes([30] * L)  # quals
            raw += b"SAZchr1,1,+,10M,60,0;\x00"  # SA tag -> chimeric
            w.write(BamRecord(bytes(raw)))
            names.append(name)
            seqs.append(seq)

    tok = CharacterTokenizer(model_max_length=32768)
    with native.NativeBamTokenizer(p, max_len=tok.max_len_single_sentence) as nt:
        out = list(nt)
    assert len(out) == 500
    for (ids, sc), name, seq in zip(out, names, seqs):
        expected = tok.encode_np(seq, truncation=True, max_length=tok.max_len_single_sentence)
        np.testing.assert_array_equal(ids, expected)
        from chimeralm_tpu.runtime.writers import resume_read_name

        assert resume_read_name(sc) == name
