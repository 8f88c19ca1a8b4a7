"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a fake mesh, per SURVEY.md §4), hermetic framework home."""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest


@pytest.fixture()
def tmp_home(tmp_path, monkeypatch):
    """Isolated framework home so tests never touch ~/deepemia_tpu."""
    home = tmp_path / "deepemia_home"
    monkeypatch.setenv("DEEPEMIA_TPU_HOME", str(home))
    # reset the cached default store
    import deepemia_tpu.config.config as cfg

    cfg._default_store = None
    yield home
    cfg._default_store = None


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)
