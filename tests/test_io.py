"""I/O layer tests: BGZF, BAM read/write/sort/index, FASTQ.

Fixtures are the reference's test BAM/FASTQ files (tests/data).
"""

import gzip
import struct

import pytest

from chimeralm_tpu.io.bam import (
    BamReader,
    BamRecord,
    BamWriter,
    bam_index,
    bam_sort,
    filter_bam,
    is_chimeric,
    iter_chimeric_reads,
)
from chimeralm_tpu.io.bgzf import BGZF_EOF, BgzfReader, BgzfWriter, is_bgzf
from chimeralm_tpu.io.fastq import FastqWriter, add_targets, parse_fastq_file, read_fastq

BAM = "tests/data/test_chimric_reads.bam"


def test_bgzf_roundtrip(tmp_path):
    data = b"chimera" * 100_000
    p = tmp_path / "x.bgzf"
    with BgzfWriter(p) as w:
        w.write(data)
    assert is_bgzf(p)
    # file ends with the spec EOF marker
    assert p.read_bytes()[-28:] == BGZF_EOF
    with BgzfReader(p) as r:
        assert r.read(len(data) + 10) == data
    # stdlib gzip can decode BGZF (concatenated members) — independent check
    assert gzip.decompress(p.read_bytes()) == data


def test_bam_reader_fixture():
    with BamReader(BAM) as r:
        assert r.header.refs[0] == ("chr1", 248956422)
        recs = list(r)
    assert len(recs) == 100
    assert all(is_chimeric(rec) for rec in recs)
    rec = recs[0]
    assert set(rec.query_sequence) <= set("ACGTN")
    assert len(rec.query_sequence) == rec.l_seq
    assert len(rec.query_qualities) == rec.l_seq
    assert rec.has_tag("SA") and not rec.has_tag("XX")
    assert isinstance(rec.get_tag("SA"), str)


def test_iter_chimeric_reads():
    reads = list(iter_chimeric_reads(BAM))
    assert len(reads) == 100
    assert set(reads[0]) == {"id", "seq"}


def test_bam_roundtrip(tmp_path):
    with BamReader(BAM) as r:
        header = r.header
        raws = [rec.raw for rec in r]
    out = tmp_path / "copy.bam"
    with BamWriter(out, header) as w:
        for raw in raws:
            w.write(BamRecord(raw))
    with BamReader(out) as r:
        assert [rec.raw for rec in r] == raws


def test_filter_sort_index(tmp_path):
    with BamReader(BAM) as r:
        names = [rec.query_name for rec in r]
    preds = {n: 1 for n in names[:7]}
    out = tmp_path / "f.bam"
    kept, dropped = filter_bam(BAM, preds, out)
    assert (kept, dropped) == (93, 7)

    sorted_out = tmp_path / "f.sorted.bam"
    bam_sort(out, sorted_out)
    with BamReader(sorted_out) as r:
        keys = [(rec.ref_id if rec.ref_id >= 0 else 1 << 30, rec.pos) for rec in r]
    assert keys == sorted(keys)

    bam_index(sorted_out)
    bai = sorted_out.with_suffix(".bam.bai")
    raw = bai.read_bytes()
    assert raw[:4] == b"BAI\x01"
    (n_ref,) = struct.unpack_from("<i", raw, 4)
    with BamReader(sorted_out) as r:
        assert n_ref == r.header.n_refs


def test_external_sort_matches_in_memory(tmp_path):
    a, b = tmp_path / "a.bam", tmp_path / "b.bam"
    bam_sort(BAM, a)
    bam_sort(BAM, b, max_mem_records=13)
    with BamReader(a) as ra, BamReader(b) as rb:
        assert [x.raw for x in ra] == [x.raw for x in rb]


def test_fastq_parse_fixture():
    reads = list(parse_fastq_file("tests/data/test_predict.fq"))
    assert len(reads) >= 1
    assert set(reads[0]) == {"id", "seq"}
    assert set(reads[0]["seq"]) <= set("ACGTN")


def test_fastq_roundtrip_and_addtarget(tmp_path):
    recs = list(read_fastq("tests/data/test.fastq"))
    assert recs
    out = tmp_path / "copy.fq.gz"
    with FastqWriter(out) as w:
        for rec in recs:
            w.write(rec)
    recs2 = list(read_fastq(out))
    assert [(r.name, r.seq, r.qual) for r in recs] == [(r.name, r.seq, r.qual) for r in recs2]

    pos = {recs[0].name}
    neg = {recs[1].name} if len(recs) > 1 else set()
    labeled = tmp_path / "labeled.fq"
    n_pos, n_neg, n_other = add_targets(out, labeled, pos, neg)
    assert n_pos == 1
    relabeled = list(read_fastq(labeled))
    assert relabeled[0].name == recs[0].name + "|1"


@pytest.mark.slow
def test_reference_end_consistency():
    with BamReader(BAM) as r:
        for rec in r:
            assert rec.reference_end > rec.pos
