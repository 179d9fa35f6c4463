"""ctypes bindings to the C++ native layer (libchimera_native.so).

The native library supplies the production host-side hot path:
multithreaded BGZF decode + BAM parse + chimeric filter + tokenization in one
C++ pass, filling flat int32 arenas the Python side wraps zero-copy into
numpy (replacing the Rust/pyo3 extension of the reference, src/python.rs,
with an actually-used fast path).

Falls back gracefully: ``available()`` is False when the library isn't built
and callers use the pure-Python io layer.

Build: ``python -m chimeralm_tpu.io.native --build`` or
``cmake -B tools/build tools && ninja -C tools/build``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_CANDIDATES = [
    Path(__file__).resolve().parents[2] / "tools" / "build" / "libchimera_native.so",
    Path(__file__).resolve().parent / "libchimera_native.so",
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for cand in _LIB_CANDIDATES:
        if cand.exists():
            lib = ctypes.CDLL(str(cand))
            lib.cl_open_bam_tokenizer.restype = ctypes.c_void_p
            lib.cl_open_bam_tokenizer.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
            lib.cl_close_bam_tokenizer.argtypes = [ctypes.c_void_p]
            lib.cl_next_tokenized_batch.restype = ctypes.c_long
            lib.cl_next_tokenized_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_int8),
            ]
            lib.cl_filter_bam.restype = ctypes.c_long
            lib.cl_filter_bam.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_long,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.cl_extract_sa.restype = ctypes.c_long
            lib.cl_extract_sa.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long, ctypes.c_int]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def build(jobs: int = 4) -> bool:
    """Compile the native library with cmake+ninja; returns success."""
    tools = Path(__file__).resolve().parents[2] / "tools"
    if not (tools / "CMakeLists.txt").exists():
        return False
    try:
        subprocess.run(["cmake", "-B", "build", "-G", "Ninja"], cwd=tools, check=True, capture_output=True)
        subprocess.run(["ninja", "-C", "build", f"-j{jobs}"], cwd=tools, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return available()


class NativeBamTokenizer:
    """Streaming tokenized chimeric reads: yields (ids int32[], sidecar int8[256])."""

    def __init__(self, path: str | Path, max_len: int = 32766, threads: int = 4, batch_reads: int = 256):
        lib = _load()
        if lib is None:
            raise RuntimeError("libchimera_native.so not built")
        self._lib = lib
        # native truncates to max_len-2 chars + CLS/SEP, matching
        # tokenizer(seq, truncation=True, max_length=max_len)
        self._handle = lib.cl_open_bam_tokenizer(str(path).encode(), max_len, threads)
        if not self._handle:
            raise OSError(f"cannot open {path}")
        self._batch_reads = batch_reads
        self._cap = batch_reads * (max_len + 2)
        self._arena = np.empty(self._cap, np.int32)
        self._offsets = np.empty(batch_reads + 1, np.int64)
        self._sidecars = np.empty(batch_reads * 256, np.int8)

    def __iter__(self):
        lib = self._lib
        while True:
            n = lib.cl_next_tokenized_batch(
                self._handle,
                self._batch_reads,
                self._arena.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self._cap,
                self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                self._sidecars.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            )
            if n < 0:
                raise RuntimeError(f"native tokenizer error ({n})")
            if n == 0:
                return
            for i in range(n):
                ids = self._arena[self._offsets[i] : self._offsets[i + 1]].copy()
                sidecar = self._sidecars[i * 256 : (i + 1) * 256].copy()
                yield ids, sidecar

    def close(self):
        if self._handle:
            self._lib.cl_close_bam_tokenizer(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def filter_bam_native(
    in_path: str | Path, out_path: str | Path, drop_names, threads: int = 4
) -> tuple[int, int]:
    """Drop reads by name via the native rewriter; returns (kept, dropped)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libchimera_native.so not built")
    blob = b"".join(n.encode() + b"\x00" for n in drop_names)
    dropped = ctypes.c_long()
    kept = lib.cl_filter_bam(
        str(in_path).encode(), str(out_path).encode(), blob, len(blob), threads, ctypes.byref(dropped)
    )
    if kept < 0:
        raise RuntimeError("native filter failed")
    return int(kept), int(dropped.value)


def extract_sa_native(in_path: str | Path, out_path: str | Path, max_reads: int = 0, threads: int = 4) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("libchimera_native.so not built")
    n = lib.cl_extract_sa(str(in_path).encode(), str(out_path).encode(), max_reads, threads)
    if n < 0:
        raise RuntimeError("native extract failed")
    return int(n)


if __name__ == "__main__":
    import sys

    if "--build" in sys.argv:
        ok = build()
        print("native build:", "ok" if ok else "FAILED")
        sys.exit(0 if ok else 1)
    print("native available:", available())
