"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a fake mesh, per SURVEY.md §4), hermetic framework home."""

import os

# Must be set before jax import anywhere in the test process. Force — the
# ambient environment points JAX_PLATFORMS at the tunneled TPU ('axon'), and
# running unit tests over the tunnel makes every eager op a network round-trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the tunneled TPU backend and
# overrides JAX_PLATFORMS; config.update after import wins.
jax.config.update("jax_platforms", "cpu")

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
