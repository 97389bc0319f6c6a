"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

Note: the harness's sitecustomize imports jax at interpreter startup and
registers the remote-TPU ('axon') PJRT plugin with JAX_PLATFORMS=axon, so env
vars set here are too late — we must go through jax.config. XLA_FLAGS is
still read lazily when the CPU client first initializes, so setting it here
(before any computation) works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
