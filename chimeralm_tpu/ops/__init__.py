"""TPU compute primitives."""

from chimeralm_tpu.ops.fft_conv import fft_conv, short_depthwise_conv  # noqa: F401


def __getattr__(name):
    import importlib

    if name in {"flash_attention", "ssd"}:
        module = importlib.import_module(f"chimeralm_tpu.ops.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chimeralm_tpu.ops' has no attribute {name!r}")
