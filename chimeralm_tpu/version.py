"""Version of the chimeralm_tpu package."""

__version__ = "0.1.0"
