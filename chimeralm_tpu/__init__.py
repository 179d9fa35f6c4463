"""ChimeraLM-TPU: a TPU-native genomic language-model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ylab-hi/ChimeraLM (reference: /root/reference): detection of artificial
chimeric long reads introduced by whole-genome amplification (WGA).

Pipeline: BAM -> chimeric-candidate selection -> char tokenization ->
HyenaDNA-backbone binary classifier (Flax, jit/pjit over a device mesh)
-> per-read label files -> BAM filter + sort + index.

Subpackages
-----------
- ``data``     tokenizers, collators, datamodules (BAM / parquet / FASTQ)
- ``io``       BGZF/BAM/FASTQ readers+writers (pure-Python + C++ native path)
- ``models``   Flax model zoo (HyenaDNA, CNN, CNN+Transformer, SSM, StripedHyena)
- ``ops``      TPU compute primitives (FFT long conv, flash attention, pooling)
- ``runtime``  predict/train/eval engines, metrics, writers, optimizers
- ``parallel`` device mesh, sharding rules, cross-host collectives
- ``config``   composable YAML config system (Hydra-style groups)
- ``utils``    logging, instantiation, profiling
- ``explain``  perturbation-based interpretability
"""

from chimeralm_tpu.version import __version__

from chimeralm_tpu import data  # noqa: F401

__all__ = ["__version__", "data"]


def __getattr__(name):
    # Lazy imports keep `import chimeralm_tpu` light (no jax/flax import cost
    # until a model or runtime is actually requested).
    import importlib

    lazy = {"io", "models", "ops", "runtime", "parallel", "config", "utils", "explain", "ui"}
    if name in lazy:
        module = importlib.import_module(f"chimeralm_tpu.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chimeralm_tpu' has no attribute {name!r}")
