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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full suite compiles hundreds of XLA:CPU executables in one
    process; past ~85 tests the accumulated live executables have twice
    produced a segfault inside a later (trivial) backend compile.  Dropping
    the compilation caches at module boundaries keeps the live-executable
    count bounded; each module recompiles only its own functions."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _isolate_global_config():
    """The process-global config dict (utils/config.py) mirrors the
    reference's module-global; snapshot/restore it so a test that calls
    set_global_config cannot leak settings (e.g. dataset.subsample) into
    later tests."""
    import copy

    from mast3r_slam_tpu.utils import config as cfg_mod

    saved = copy.deepcopy(cfg_mod.config)
    yield
    cfg_mod.config.clear()
    cfg_mod.config.update(saved)


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
