"""BAM reading/writing/sorting/indexing from the SAM spec §4.

Replaces pysam (reference: chimeralm/data/bam.py, chimeralm/__main__.py) and
the noodles/deepbiop stack (reference: src/bin/*.rs).  Pure-Python layer;
``chimeralm_tpu.io.native`` provides the C++ fast path with an identical API.

Key semantics reproduced:

* ``is_chimeric``: primary, mapped, SA-tagged reads
  (reference: chimeralm/data/bam.py:21-23).
* filter-rewrite keeps every record whose read name is NOT predicted 1,
  including unpredicted reads (reference: __main__.py:129-137).
* coordinate sort: (refID, pos) with unmapped (refID=-1) last — samtools order.
* BAI index: binning + 16kb linear index + samtools metadata pseudo-bin.
"""

from __future__ import annotations

import heapq
import struct
import tempfile
from pathlib import Path

from chimeralm_tpu.io.bgzf import BgzfReader, BgzfWriter

BAM_MAGIC = b"BAM\x01"
SEQ_NIBBLE = "=ACMGRSVTWYHKDBN"

FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SECONDARY = 0x100
FLAG_QCFAIL = 0x200
FLAG_DUP = 0x400
FLAG_SUPPLEMENTARY = 0x800

_REC_FIXED = struct.Struct("<iiBBHHHiiii")

# 512-entry LUT: byte of packed SEQ -> two characters
_SEQ_LUT = [SEQ_NIBBLE[b >> 4] + SEQ_NIBBLE[b & 0xF] for b in range(256)]

# cigar op consumes reference? ops: MIDNSHP=X
_CIGAR_REF_CONSUME = (True, False, True, True, False, False, False, True, True)


class BamHeader:
    """Parsed BAM header: SAM text + reference dictionary."""

    def __init__(self, text: str, refs: list[tuple[str, int]]):
        self.text = text
        self.refs = refs  # [(name, length)]

    @property
    def n_refs(self) -> int:
        return len(self.refs)

    def to_bytes(self) -> bytes:
        out = bytearray(BAM_MAGIC)
        text_b = self.text.encode()
        out += struct.pack("<i", len(text_b))
        out += text_b
        out += struct.pack("<i", len(self.refs))
        for name, length in self.refs:
            name_b = name.encode() + b"\x00"
            out += struct.pack("<i", len(name_b))
            out += name_b
            out += struct.pack("<i", length)
        return bytes(out)


class BamRecord:
    """One alignment record, parsed lazily from its raw bytes.

    ``raw`` excludes the leading ``block_size`` int32; writers re-emit raw
    unchanged so filtered BAMs are byte-faithful per record.
    """

    __slots__ = ("raw",)

    def __init__(self, raw: bytes):
        self.raw = raw

    # -- fixed fields ------------------------------------------------------
    @property
    def ref_id(self) -> int:
        return struct.unpack_from("<i", self.raw, 0)[0]

    @property
    def pos(self) -> int:
        return struct.unpack_from("<i", self.raw, 4)[0]

    @property
    def _l_read_name(self) -> int:
        return self.raw[8]

    @property
    def mapq(self) -> int:
        return self.raw[9]

    @property
    def bin(self) -> int:
        return struct.unpack_from("<H", self.raw, 10)[0]

    @property
    def n_cigar_op(self) -> int:
        return struct.unpack_from("<H", self.raw, 12)[0]

    @property
    def flag(self) -> int:
        return struct.unpack_from("<H", self.raw, 14)[0]

    @property
    def l_seq(self) -> int:
        return struct.unpack_from("<i", self.raw, 16)[0]

    @property
    def next_ref_id(self) -> int:
        return struct.unpack_from("<i", self.raw, 20)[0]

    @property
    def next_pos(self) -> int:
        return struct.unpack_from("<i", self.raw, 24)[0]

    @property
    def tlen(self) -> int:
        return struct.unpack_from("<i", self.raw, 28)[0]

    # -- variable fields ---------------------------------------------------
    @property
    def query_name(self) -> str:
        return self.raw[32 : 32 + self._l_read_name - 1].decode("ascii", "replace")

    @property
    def _cigar_off(self) -> int:
        return 32 + self._l_read_name

    @property
    def _seq_off(self) -> int:
        return self._cigar_off + 4 * self.n_cigar_op

    @property
    def _qual_off(self) -> int:
        return self._seq_off + (self.l_seq + 1) // 2

    @property
    def _tag_off(self) -> int:
        return self._qual_off + self.l_seq

    @property
    def cigar(self) -> list[tuple[int, int]]:
        """[(op, length)] with op indices into MIDNSHP=X."""
        out = []
        off = self._cigar_off
        for _ in range(self.n_cigar_op):
            v = struct.unpack_from("<I", self.raw, off)[0]
            out.append((v & 0xF, v >> 4))
            off += 4
        return out

    @property
    def reference_end(self) -> int:
        """0-based exclusive end on the reference (pos + ref-consumed cigar)."""
        end = self.pos
        for op, length in self.cigar:
            if _CIGAR_REF_CONSUME[op]:
                end += length
        return end if end > self.pos else self.pos + 1

    @property
    def query_sequence(self) -> str:
        l_seq = self.l_seq
        if l_seq == 0:
            return ""
        off = self._seq_off
        packed = self.raw[off : off + (l_seq + 1) // 2]
        chars = "".join(_SEQ_LUT[b] for b in packed)
        return chars[:l_seq]

    @property
    def query_qualities(self) -> list[int]:
        off = self._qual_off
        return list(self.raw[off : off + self.l_seq])

    # -- flags -------------------------------------------------------------
    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & FLAG_UNMAPPED)

    @property
    def is_secondary(self) -> bool:
        return bool(self.flag & FLAG_SECONDARY)

    @property
    def is_supplementary(self) -> bool:
        return bool(self.flag & FLAG_SUPPLEMENTARY)

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & FLAG_REVERSE)

    # -- tags ----------------------------------------------------------------
    def _iter_tags(self):
        raw = self.raw
        off = self._tag_off
        n = len(raw)
        while off + 3 <= n:
            tag = raw[off : off + 2]
            typ = raw[off + 2 : off + 3]
            off += 3
            if typ in (b"A", b"c", b"C"):
                val_off, val_len = off, 1
            elif typ in (b"s", b"S"):
                val_off, val_len = off, 2
            elif typ in (b"i", b"I", b"f"):
                val_off, val_len = off, 4
            elif typ in (b"Z", b"H"):
                end = raw.index(b"\x00", off)
                val_off, val_len = off, end - off
                off = end + 1
                yield tag, typ, val_off, val_len
                continue
            elif typ == b"B":
                sub = raw[off : off + 1]
                count = struct.unpack_from("<I", raw, off + 1)[0]
                size = {b"c": 1, b"C": 1, b"s": 2, b"S": 2, b"i": 4, b"I": 4, b"f": 4}[sub]
                val_off, val_len = off, 5 + count * size
            else:
                raise ValueError(f"unknown tag type {typ!r} in record {self.query_name}")
            off += val_len
            yield tag, typ, val_off, val_len

    def has_tag(self, name: str) -> bool:
        want = name.encode()
        return any(tag == want for tag, _typ, _o, _l in self._iter_tags())

    def get_tag(self, name: str):
        want = name.encode()
        for tag, typ, off, length in self._iter_tags():
            if tag != want:
                continue
            raw = self.raw
            if typ == b"A":
                return chr(raw[off])
            if typ == b"c":
                return struct.unpack_from("<b", raw, off)[0]
            if typ == b"C":
                return raw[off]
            if typ == b"s":
                return struct.unpack_from("<h", raw, off)[0]
            if typ == b"S":
                return struct.unpack_from("<H", raw, off)[0]
            if typ == b"i":
                return struct.unpack_from("<i", raw, off)[0]
            if typ == b"I":
                return struct.unpack_from("<I", raw, off)[0]
            if typ == b"f":
                return struct.unpack_from("<f", raw, off)[0]
            if typ in (b"Z", b"H"):
                return raw[off : off + length].decode("ascii", "replace")
            if typ == b"B":
                sub = raw[off : off + 1].decode()
                count = struct.unpack_from("<I", raw, off + 1)[0]
                fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
                return list(struct.unpack_from(f"<{count}{fmt}", raw, off + 5))
        raise KeyError(name)


def is_chimeric(read: BamRecord) -> bool:
    """Primary mapped read carrying an SA tag (reference: bam.py:21-23)."""
    return (
        not read.is_unmapped
        and not read.is_secondary
        and not read.is_supplementary
        and read.has_tag("SA")
    )


class BamReader:
    """Streaming BAM reader over BGZF."""

    def __init__(self, path: str | Path, threads: int = 4):
        self._bgzf = BgzfReader(path, threads=threads)
        magic = self._bgzf.read_exact(4)
        if magic != BAM_MAGIC:
            raise ValueError(f"{path}: not a BAM file")
        (l_text,) = struct.unpack("<i", self._bgzf.read_exact(4))
        text = self._bgzf.read_exact(l_text).decode("ascii", "replace").rstrip("\x00")
        (n_ref,) = struct.unpack("<i", self._bgzf.read_exact(4))
        refs = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", self._bgzf.read_exact(4))
            name = self._bgzf.read_exact(l_name)[:-1].decode()
            (l_ref,) = struct.unpack("<i", self._bgzf.read_exact(4))
            refs.append((name, l_ref))
        self.header = BamHeader(text, refs)

    def __iter__(self):
        return self

    def __next__(self) -> BamRecord:
        size_b = self._bgzf.read(4)
        if len(size_b) < 4:
            raise StopIteration
        (block_size,) = struct.unpack("<i", size_b)
        raw = self._bgzf.read_exact(block_size)
        return BamRecord(raw)

    def records_with_voffsets(self):
        """Yield (voffset_start, voffset_end, record) for index building."""
        while True:
            start = self._bgzf.virtual_offset
            size_b = self._bgzf.read(4)
            if len(size_b) < 4:
                return
            (block_size,) = struct.unpack("<i", size_b)
            raw = self._bgzf.read_exact(block_size)
            end = self._bgzf.virtual_offset
            yield start, end, BamRecord(raw)

    def close(self):
        self._bgzf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BamWriter:
    """BAM writer over BGZF; emits raw records unchanged."""

    def __init__(self, path: str | Path, header: BamHeader, threads: int = 4, level: int = 6):
        self._bgzf = BgzfWriter(path, threads=threads, level=level)
        self._bgzf.write(header.to_bytes())
        # header and records must not share a block boundary requirement,
        # but keeping the header in its own block(s) matches htslib behavior
        self._bgzf.flush_block()

    @property
    def virtual_offset(self) -> int:
        return self._bgzf.virtual_offset

    def write(self, record: BamRecord):
        self._bgzf.write(struct.pack("<i", len(record.raw)) + record.raw)

    def close(self):
        self._bgzf.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# sort + index (pysam.sort / pysam.index equivalents)
# ---------------------------------------------------------------------------


def _sort_key(rec: BamRecord) -> tuple[int, int]:
    ref_id = rec.ref_id
    return (ref_id if ref_id >= 0 else 0x7FFFFFFF, rec.pos)


def bam_sort(
    in_path: str | Path,
    out_path: str | Path,
    threads: int = 4,
    max_mem_records: int = 500_000,
) -> None:
    """Coordinate-sort a BAM (samtools sort semantics: refID, pos; unmapped last).

    Spills sorted runs to temp files and k-way merges when the input exceeds
    ``max_mem_records``.
    """
    runs: list[Path] = []
    with BamReader(in_path, threads=threads) as reader:
        header = reader.header
        buf: list[tuple[tuple[int, int], bytes]] = []

        def flush_run():
            buf.sort(key=lambda kv: kv[0])
            tmp = Path(tempfile.mkstemp(suffix=".bam.run")[1])
            with BamWriter(tmp, header, threads=threads, level=1) as w:
                for _k, raw in buf:
                    w.write(BamRecord(raw))
            runs.append(tmp)
            buf.clear()

        for rec in reader:
            buf.append((_sort_key(rec), rec.raw))
            if len(buf) >= max_mem_records:
                flush_run()

        if not runs:
            buf.sort(key=lambda kv: kv[0])
            with BamWriter(out_path, header, threads=threads) as w:
                for _k, raw in buf:
                    w.write(BamRecord(raw))
            return
        if buf:
            flush_run()

    readers = [BamReader(r, threads=1) for r in runs]

    def keyed(reader_idx, reader):
        for rec in reader:
            yield (_sort_key(rec), reader_idx, rec.raw)

    with BamWriter(out_path, header, threads=threads) as w:
        for _key, _idx, raw in heapq.merge(*[keyed(i, r) for i, r in enumerate(readers)]):
            w.write(BamRecord(raw))
    for r, p in zip(readers, runs):
        r.close()
        p.unlink(missing_ok=True)


def _reg2bin(beg: int, end: int) -> int:
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


_METADATA_BIN = 37450


def bam_index(bam_path: str | Path, index_path: str | Path | None = None, threads: int = 4) -> None:
    """Build a BAI index for a coordinate-sorted BAM (SAM spec §5.2)."""
    bam_path = Path(bam_path)
    if index_path is None:
        index_path = bam_path.with_suffix(bam_path.suffix + ".bai")

    with BamReader(bam_path, threads=threads) as reader:
        n_ref = reader.header.n_refs
        bins: list[dict[int, list[list[int]]]] = [dict() for _ in range(n_ref)]
        linear: list[dict[int, int]] = [dict() for _ in range(n_ref)]
        stats = [[None, None, 0, 0] for _ in range(n_ref)]  # off_beg, off_end, n_mapped, n_unmapped
        n_no_coor = 0

        for start, end, rec in reader.records_with_voffsets():
            ref_id = rec.ref_id
            if ref_id < 0:
                n_no_coor += 1
                continue
            pos = rec.pos
            rend = rec.reference_end if not rec.is_unmapped else pos + 1
            b = _reg2bin(pos, rend)
            chunks = bins[ref_id].setdefault(b, [])
            if chunks and chunks[-1][1] == start:
                chunks[-1][1] = end  # coalesce adjacent chunks
            else:
                chunks.append([start, end])
            # linear index over 16kb windows
            for win in range(pos >> 14, ((rend - 1) >> 14) + 1):
                cur = linear[ref_id].get(win)
                if cur is None or start < cur:
                    linear[ref_id][win] = start
            st = stats[ref_id]
            if st[0] is None or start < st[0]:
                st[0] = start
            if st[1] is None or end > st[1]:
                st[1] = end
            if rec.is_unmapped:
                st[3] += 1
            else:
                st[2] += 1

    out = bytearray(b"BAI\x01")
    out += struct.pack("<i", n_ref)
    for ref_id in range(n_ref):
        ref_bins = bins[ref_id]
        has_meta = stats[ref_id][0] is not None
        out += struct.pack("<i", len(ref_bins) + (1 if has_meta else 0))
        for b in sorted(ref_bins):
            chunks = ref_bins[b]
            out += struct.pack("<Ii", b, len(chunks))
            for beg, end in chunks:
                out += struct.pack("<QQ", beg, end)
        if has_meta:
            off_beg, off_end, n_mapped, n_unmapped = stats[ref_id]
            out += struct.pack("<Ii", _METADATA_BIN, 2)
            out += struct.pack("<QQ", off_beg, off_end)
            out += struct.pack("<QQ", n_mapped, n_unmapped)
        lin = linear[ref_id]
        n_intv = (max(lin) + 1) if lin else 0
        out += struct.pack("<i", n_intv)
        filled = 0
        for win in range(n_intv):
            v = lin.get(win)
            if v is not None:
                filled = v
            out += struct.pack("<Q", filled)
    out += struct.pack("<Q", n_no_coor)
    Path(index_path).write_bytes(bytes(out))


def filter_bam(
    bam_path: str | Path,
    predictions: dict[str, int],
    output_path: str | Path,
    threads: int = 4,
) -> tuple[int, int]:
    """Drop reads predicted 1; keep everything else (reference: __main__.py:129-137).

    Returns (kept, dropped).
    """
    kept = dropped = 0
    with BamReader(bam_path, threads=threads) as reader:
        with BamWriter(output_path, reader.header, threads=threads) as writer:
            for rec in reader:
                if predictions.get(rec.query_name) == 1:
                    dropped += 1
                    continue
                writer.write(rec)
                kept += 1
    return kept, dropped


def iter_chimeric_reads(path: str | Path, threads: int = 4):
    """Yield ``{"id", "seq"}`` for SA-tagged primary reads (reference: bam.py:26-38)."""
    with BamReader(path, threads=threads) as reader:
        for rec in reader:
            if is_chimeric(rec):
                yield {"id": rec.query_name, "seq": rec.query_sequence}
