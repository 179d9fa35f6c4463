"""FASTQ reading/writing (plain, gzip, or BGZF), replacing pyfastx/noodles.

Reference semantics: chimeralm/data/only_fq.py:22-41 (``parse_fastq_file``
yields ``{"id": name, "seq": sequence}``) and src/bin/addtarget.rs:43-78
(append ``|label`` to read names, bgzip-parallel rewrite).
"""

from __future__ import annotations

import gzip
from pathlib import Path

from chimeralm_tpu.io.bgzf import BgzfWriter


class FastqRecord:
    __slots__ = ("name", "comment", "seq", "qual")

    def __init__(self, name: str, comment: str, seq: str, qual: str):
        self.name = name
        self.comment = comment
        self.seq = seq
        self.qual = qual

    def quality_values(self, offset: int = 33) -> list[int]:
        return [ord(c) - offset for c in self.qual]

    def to_bytes(self) -> bytes:
        head = f"@{self.name} {self.comment}" if self.comment else f"@{self.name}"
        return f"{head}\n{self.seq}\n+\n{self.qual}\n".encode()


def _open_text(path: str | Path):
    path = Path(path)
    with open(path, "rb") as f:
        head = f.read(2)
    if head[:2] == b"\x1f\x8b":
        return gzip.open(path, "rt")  # plain gzip reader also handles BGZF
    return open(path, "rt")


def read_fastq(path: str | Path):
    """Yield FastqRecord from .fq/.fastq(.gz)."""
    with _open_text(path) as f:
        while True:
            header = f.readline()
            if not header:
                return
            header = header.rstrip("\n")
            if not header:
                continue
            if not header.startswith("@"):
                raise ValueError(f"bad FASTQ header: {header[:50]!r}")
            seq = f.readline().rstrip("\n")
            plus = f.readline()
            if not plus.startswith("+"):
                raise ValueError("bad FASTQ separator line")
            qual = f.readline().rstrip("\n")
            parts = header[1:].split(None, 1)
            name = parts[0]
            comment = parts[1] if len(parts) > 1 else ""
            yield FastqRecord(name, comment, seq, qual)


def parse_fastq_file(file_path: str | Path):
    """Yield ``{"id", "seq"}`` dicts (reference: only_fq.py:22-41)."""
    for rec in read_fastq(file_path):
        yield {"id": rec.name, "seq": rec.seq}


def parse_fastq_file_with_qual(file_path: str | Path, offset: int = 33):
    """Yield ``{"id", "seq", "qual"}`` (parquet-pipeline schema of fq.py)."""
    for rec in read_fastq(file_path):
        yield {"id": rec.name, "seq": rec.seq, "qual": rec.quality_values(offset)}


class FastqWriter:
    """FASTQ writer; bgzip output when the path ends in .gz."""

    def __init__(self, path: str | Path, threads: int = 4):
        path = Path(path)
        if path.suffix == ".gz":
            self._fh = BgzfWriter(path, threads=threads)
        else:
            self._fh = open(path, "wb")

    def write(self, rec: FastqRecord):
        self._fh.write(rec.to_bytes())

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def add_targets(
    fq_path: str | Path,
    out_path: str | Path,
    positive_names: set[str],
    negative_names: set[str],
    threads: int = 4,
) -> tuple[int, int, int]:
    """Append ``|1``/``|0`` to read names by membership (reference: addtarget.rs:43-78).

    Returns (n_pos, n_neg, n_unlabeled); unlabeled reads pass through unchanged.
    """
    n_pos = n_neg = n_other = 0
    with FastqWriter(out_path, threads=threads) as w:
        for rec in read_fastq(fq_path):
            if rec.name in positive_names:
                rec.name = f"{rec.name}|1"
                n_pos += 1
            elif rec.name in negative_names:
                rec.name = f"{rec.name}|0"
                n_neg += 1
            else:
                n_other += 1
            w.write(rec)
    return n_pos, n_neg, n_other
