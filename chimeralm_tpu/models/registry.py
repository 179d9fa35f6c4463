"""Model registry: name -> constructor for every backbone family."""

from __future__ import annotations


def build(name: str, **kwargs):
    """Construct a model by registry name."""
    from chimeralm_tpu.models import cnn, hyena, ssm, striped_hyena, transformer

    registry = {
        "hyenadna": lambda **kw: hyena.HyenaDnaClassifier(
            kw.pop("config", hyena.small_32k_config()), **kw
        ),
        "hyenadna-tiny": lambda **kw: hyena.HyenaDnaClassifier(
            kw.pop("config", hyena.tiny_config()), **kw
        ),
        "cnn": cnn.DNAConvNet,
        "transformer": transformer.SequenceCNNTransformer,
        "mamba": ssm.MambaSequenceClassification,
        "mambasp": ssm.MambaSequenceClassificationSP,
        "mamba-positional": ssm.MambaSequenceClassificationPositional,
        "striped-hyena": striped_hyena.HyenaDNAClassifier,
    }
    if name not in registry:
        raise KeyError(f"unknown model {name!r}; available: {sorted(registry)}")
    return registry[name](**kwargs)


def available() -> list[str]:
    return [
        "hyenadna",
        "hyenadna-tiny",
        "cnn",
        "transformer",
        "mamba",
        "mambasp",
        "mamba-positional",
        "striped-hyena",
    ]
