"""Parquet datamodule (reference-parity module path: chimeralm/data/fq.py)."""

from chimeralm_tpu.data.datamodule import ParquetDataModule
from chimeralm_tpu.data.datamodule import ParquetDataModule as DataModule  # noqa: F401

__all__ = ["DataModule", "ParquetDataModule"]
