"""BGZF (blocked gzip) reader/writer implemented from the SAM spec §4.1.

Replaces the reference's noodles ``bgzf::io::MultithreadedReader``
(reference: src/bin/extractsa.rs:50) and pysam's htslib layer.  Blocks are
inflated/deflated on a thread pool — zlib releases the GIL, so decode
parallelism scales with cores even from Python.

Virtual file offsets (``coffset << 16 | uoffset``) are exposed by both
directions so the BAI indexer can be driven directly by the writer.
"""

from __future__ import annotations

import io
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

# 28-byte EOF marker mandated by the spec (empty BGZF block).
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_MAX_BLOCK = 65536
# target uncompressed payload per block; leaves headroom so the compressed
# block (header + deflate + footer) stays under 64 KiB
_TARGET_PAYLOAD = 65280

_HEADER = struct.Struct("<4BI2BH")  # ID1 ID2 CM FLG MTIME XFL OS XLEN = 12 bytes
_SUBFIELD = struct.Struct("<2BH")


def _deflate_block(payload: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    bsize = len(comp) + 25  # header(12) + extra(6) + footer(8) = 26; BSIZE = total-1
    block = bytearray()
    block += _HEADER.pack(0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)  # gzip header with FEXTRA
    block += struct.pack("<2BH", 66, 67, 2)  # SI1='B' SI2='C' SLEN=2
    block += struct.pack("<H", bsize)
    block += comp
    block += struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload) & 0xFFFFFFFF)
    return bytes(block)


def _inflate_block(raw: bytes) -> bytes:
    # raw is the full BGZF block; deflate payload starts at 18, ends 8 before end
    return zlib.decompress(raw[18:-8], -15)


class BgzfReader:
    """Streaming BGZF reader with pipelined multithreaded inflate."""

    def __init__(self, path: str | Path, threads: int = 4, readahead: int = 32):
        self._fh = open(path, "rb")
        self._pool = ThreadPoolExecutor(max_workers=max(1, threads)) if threads > 0 else None
        self._readahead = max(1, readahead)
        self._pending = []  # list[(coffset, Future|bytes)]
        self._buf = b""
        self._buf_pos = 0
        self._block_coffset = 0  # compressed offset of the block now in _buf
        self._eof = False

    # -- block plumbing ----------------------------------------------------
    def _read_raw_block(self):
        coffset = self._fh.tell()
        header = self._fh.read(12)
        if len(header) == 0:
            return None
        if len(header) < 12:
            raise ValueError("truncated BGZF header")
        magic1, magic2, _cm, flg, _mtime, _xfl, _os, xlen = _HEADER.unpack(header)
        if magic1 != 0x1F or magic2 != 0x8B or not flg & 4:
            raise ValueError("not a BGZF block")
        extra = self._fh.read(xlen)
        bsize = None
        off = 0
        while off + 4 <= len(extra):
            si1, si2, slen = _SUBFIELD.unpack_from(extra, off)
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack_from("<H", extra, off + 4)[0]
            off += 4 + slen
        if bsize is None:
            raise ValueError("missing BGZF BSIZE field")
        rest = self._fh.read(bsize + 1 - 12 - xlen)
        raw = header + extra + rest
        return coffset, raw

    def _fill_pipeline(self):
        while not self._eof and len(self._pending) < self._readahead:
            item = self._read_raw_block()
            if item is None:
                self._eof = True
                break
            coffset, raw = item
            if self._pool is not None:
                self._pending.append((coffset, self._pool.submit(_inflate_block, raw)))
            else:
                self._pending.append((coffset, _inflate_block(raw)))

    def _next_block(self) -> bool:
        """Load the next non-empty block into the buffer. False at EOF."""
        while True:
            self._fill_pipeline()
            if not self._pending:
                return False
            coffset, fut = self._pending.pop(0)
            data = fut.result() if hasattr(fut, "result") else fut
            if not data:
                continue  # empty block (EOF marker mid-file is legal)
            self._buf = data
            self._buf_pos = 0
            self._block_coffset = coffset
            return True

    # -- public API --------------------------------------------------------
    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if self._buf_pos >= len(self._buf):
                if not self._next_block():
                    break
            take = min(n, len(self._buf) - self._buf_pos)
            out += self._buf[self._buf_pos : self._buf_pos + take]
            self._buf_pos += take
            n -= take
        return bytes(out)

    def read_exact(self, n: int) -> bytes:
        data = self.read(n)
        if len(data) != n:
            raise EOFError(f"expected {n} bytes, got {len(data)}")
        return data

    @property
    def virtual_offset(self) -> int:
        """Voffset of the next byte to be read."""
        if self._buf_pos >= len(self._buf):
            # next read starts at the next block; peek its coffset lazily
            self._fill_pipeline()
            if self._pending:
                return self._pending[0][0] << 16
            return self._fh.tell() << 16
        return (self._block_coffset << 16) | self._buf_pos

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BgzfWriter:
    """BGZF writer with parallel deflate and virtual-offset tracking."""

    def __init__(self, path: str | Path, threads: int = 4, level: int = 6):
        self._fh = open(path, "wb")
        self._pool = ThreadPoolExecutor(max_workers=max(1, threads)) if threads > 0 else None
        self._level = level
        self._buf = bytearray()
        self._coffset = 0  # compressed bytes scheduled so far
        self._futures = []
        self._max_inflight = 64

    @property
    def virtual_offset(self) -> int:
        """Voffset where the next ``write`` will land."""
        return (self._coffset << 16) | len(self._buf)

    def _drain(self, limit: int):
        while len(self._futures) > limit:
            blk = self._futures.pop(0)
            self._fh.write(blk.result() if hasattr(blk, "result") else blk)

    def _emit(self, payload: bytes):
        if self._pool is not None:
            self._futures.append(self._pool.submit(_deflate_block, payload, self._level))
        else:
            self._futures.append(_deflate_block(payload, self._level))
        self._drain(self._max_inflight)

    def write(self, data: bytes) -> int:
        self._buf += data
        while len(self._buf) >= _TARGET_PAYLOAD:
            payload = bytes(self._buf[:_TARGET_PAYLOAD])
            del self._buf[:_TARGET_PAYLOAD]
            # compressed size isn't known yet, but voffsets only need the
            # *uncompressed* position within the current block plus the count
            # of compressed bytes already *finalized*; we therefore compute
            # compressed sizes synchronously for offset correctness.
            self._coffset += self._finalized_size(payload)
        return len(data)

    def _finalized_size(self, payload: bytes) -> int:
        if self._pool is not None:
            fut = self._pool.submit(_deflate_block, payload, self._level)
            self._futures.append(fut)
            self._drain(self._max_inflight)
            # Block size must be known to keep voffsets exact; waiting on this
            # future alone still overlaps deflate of queued blocks.
            blk = fut.result()
            # already appended; replace future with resolved bytes
            self._futures[-1] = blk
            return len(blk)
        blk = _deflate_block(payload, self._level)
        self._futures.append(blk)
        self._drain(self._max_inflight)
        return len(blk)

    def flush_block(self):
        if self._buf:
            payload = bytes(self._buf)
            self._buf.clear()
            self._coffset += self._finalized_size(payload)

    def close(self):
        self.flush_block()
        self._drain(0)
        self._fh.write(BGZF_EOF)
        self._fh.close()
        if self._pool is not None:
            self._pool.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def is_bgzf(path: str | Path) -> bool:
    with open(path, "rb") as f:
        head = f.read(4)
    return len(head) == 4 and head[0] == 0x1F and head[1] == 0x8B and head[3] & 4 != 0


def decompress_all(path: str | Path, threads: int = 4) -> bytes:
    """Inflate an entire BGZF file into memory (small files / tests)."""
    chunks = []
    with BgzfReader(path, threads=threads) as r:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            chunks.append(chunk)
    return b"".join(chunks)
