"""Flax model zoo."""


def __getattr__(name):
    import importlib

    lazy = {"hyena", "cnn", "transformer", "ssm", "striped_hyena", "registry", "convert", "lm"}
    if name in lazy:
        module = importlib.import_module(f"chimeralm_tpu.models.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chimeralm_tpu.models' has no attribute {name!r}")
