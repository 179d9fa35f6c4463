"""FASTQ datamodule (reference-parity module path: chimeralm/data/only_fq.py)."""

from chimeralm_tpu.data.datamodule import FastqDataModule
from chimeralm_tpu.data.datamodule import FastqDataModule as OnlyFqDataModule  # noqa: F401
from chimeralm_tpu.io.fastq import parse_fastq_file  # noqa: F401

__all__ = ["OnlyFqDataModule", "FastqDataModule", "parse_fastq_file"]
