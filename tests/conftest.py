"""Test harness config: force CPU with an 8-device virtual mesh.

Sharding tests run on a virtual CPU mesh (the multi-chip path is
validated the same way the driver's dryrun does); Pallas kernels run in
interpreter mode on CPU.  Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-register a TPU platform plugin and pin
# JAX_PLATFORMS before this file runs; jax.config is the reliable
# override (must happen before any backend is used).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

DATA_DIR = pathlib.Path(__file__).resolve().parent.parent / "data"


@pytest.fixture(scope="session")
def data_dir():
    return DATA_DIR
