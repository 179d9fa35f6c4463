"""Test configuration: force a virtual 8-device CPU platform for JAX.

TPU hardware in CI is a single chip; sharding tests need N devices, so the
whole suite runs on the CPU backend with 8 virtual devices (the driver
validates the multi-chip path the same way via ``__graft_entry__.dryrun_multichip``).
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The image's sitecustomize force-registers the axon TPU platform and
# overwrites JAX_PLATFORMS; override it back after import, before backend init.
jax.config.update("jax_platforms", "cpu")

import pytest


DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA_DIR
