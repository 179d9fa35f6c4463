"""Runtime engines: predict/train/eval drivers, metrics, writers."""

from chimeralm_tpu.runtime.writers import (  # noqa: F401
    CustomWriter,
    PredictionWriter,
    load_predictions_from_folder,
    load_predicts,
    resume_read_name,
)


def __getattr__(name):
    import importlib

    lazy = {"predictor", "trainer", "task", "metrics", "optim"}
    if name in lazy:
        module = importlib.import_module(f"chimeralm_tpu.runtime.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chimeralm_tpu.runtime' has no attribute {name!r}")
