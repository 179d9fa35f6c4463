"""Composable config system (Hydra-style groups without hydra)."""

from chimeralm_tpu.config.compose import DEFAULT_CONFIG_DIR, ConfigError, compose, to_yaml  # noqa: F401
