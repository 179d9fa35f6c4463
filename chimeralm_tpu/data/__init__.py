"""Data layer: tokenizers, collators, datamodules."""

from chimeralm_tpu.data import tokenizer  # noqa: F401
from chimeralm_tpu.data.collator import DataCollator  # noqa: F401
from chimeralm_tpu.data.tokenizer import (  # noqa: F401
    CharacterTokenizer,
    KmerTokenizer,
    load_tokenizer_from_hyena_model,
)


def __getattr__(name):
    import importlib

    lazy = {"bam", "fq", "only_fq", "bucketing"}
    if name in lazy:
        module = importlib.import_module(f"chimeralm_tpu.data.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chimeralm_tpu.data' has no attribute {name!r}")
