"""Interpretability tools."""

from chimeralm_tpu.explain.motif import (  # noqa: F401
    Mamba2Analyzer,
    ModelAnalyzer,
    analyze_mamba2_sequence,
    analyze_sequence,
)
