"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a fake mesh, per SURVEY.md §4), hermetic framework home."""

import os

# Must be set before jax import anywhere in the test process. Force — the
# ambient environment points JAX_PLATFORMS at the tunneled TPU ('axon'), and
# running unit tests over the tunnel makes every eager op a network round-trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU compile time is dominated by LLVM optimization passes; the suite
# checks correctness, not CPU codegen quality. Measured on the 1-core
# bench host: test_inference.py cold 705s -> 598s. Does not change
# numerics (no fast-math); TPU benches/dryruns keep full optimization.
if "xla_llvm_disable_expensive_passes" not in flags:
    flags = flags + " --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags

import jax

# The axon sitecustomize force-registers the tunneled TPU backend and
# overrides JAX_PLATFORMS; config.update after import wins.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated by
# re-compiling the same model programs every run (VERDICT r2 weak #6). With
# the cache warm, repeat runs skip those compiles entirely. Override the
# location with DEEPEMIA_TPU_TEST_XLA_CACHE; set it to "0" to disable.
# Namespaced per host so foreign-machine AOT entries are never loaded
# (see deepemia_tpu/utils/xla_cache.py).
import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache()

import pytest


def pytest_collection_modifyitems(items):
    # `compiles` implies `slow`: the fast lane is selected with
    # `-m "not slow"` (the documented gate), and cold-compile-heavy tests
    # must fall out of it without every caller having to know about the
    # finer-grained marker. `-m compiles` still selects exactly the
    # compile shard (CI third step).
    for item in items:
        if "compiles" in item.keywords:
            item.add_marker(pytest.mark.slow)


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


@pytest.fixture(scope="session")
def tiny_r50():
    """Session-shared tiny model: R50, 2 classes, f32, params at 64x64
    (seed 0). Files that don't depend on a specific init seed should use
    this instead of building their own (one init + one set of compiles per
    session instead of per file — VERDICT r2 weak #6)."""
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    model = build_model("R50", num_classes=2, use_bf16=False)
    params = init_params(model, (64, 64), seed=0)
    return model, params
