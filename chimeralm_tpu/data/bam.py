"""BAM datamodule (reference-parity module path: chimeralm/data/bam.py)."""

from chimeralm_tpu.data.datamodule import BamDataModule  # noqa: F401
from chimeralm_tpu.io.bam import is_chimeric, iter_chimeric_reads  # noqa: F401


def parse_bam_file(file_path):
    """Yield ``{"id", "seq"}`` for chimeric reads (reference: bam.py:26-38)."""
    return iter_chimeric_reads(file_path)
