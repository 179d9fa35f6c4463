"""Genomics I/O: BGZF, BAM, FASTQ — pure-Python + C++ native fast path."""

from chimeralm_tpu.io.bam import (  # noqa: F401
    BamHeader,
    BamReader,
    BamRecord,
    BamWriter,
    bam_index,
    bam_sort,
    filter_bam,
    is_chimeric,
    iter_chimeric_reads,
)
from chimeralm_tpu.io.bgzf import BgzfReader, BgzfWriter, is_bgzf  # noqa: F401


def __getattr__(name):
    import importlib

    lazy = {"fastq", "native"}
    if name in lazy:
        module = importlib.import_module(f"chimeralm_tpu.io.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chimeralm_tpu.io' has no attribute {name!r}")
