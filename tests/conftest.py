"""Test harness config: force CPU with 8 virtual devices so multi-chip sharding
is testable without TPU hardware (SURVEY.md §4 test plan, item (d)).

Must run before jax is imported anywhere.
"""

import os

# The session env presets JAX_PLATFORMS=axon (real TPU via tunnel) and a
# sitecustomize hook registers the axon PJRT plugin at interpreter startup, so
# plain env-var overrides are unreliable here; jax.config.update is the robust
# way to pin tests to CPU. XLA_FLAGS must be set before the CPU client exists.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiger():
    """320x240 RGB sample from the reference tree (SURVEY.md component 15)."""
    from jpeg_tpu.io import bmp

    return bmp.read_bmp("/root/reference/src/images/tiger.bmp")


@pytest.fixture(scope="session")
def cam():
    from jpeg_tpu.io import bmp

    return bmp.read_bmp("/root/reference/src/images/cam.bmp")


def psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0**2 / mse)
