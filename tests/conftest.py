"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the environment before JAX initializes its backends; mirrors
the multi-host-on-CPU fake-backend strategy from SURVEY.md §4.
"""

import os

# Force CPU even when the environment preconfigures a TPU platform.
# The axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding JAX_PLATFORMS — so the
# config must be re-overridden here, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
