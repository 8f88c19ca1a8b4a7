"""Host-fingerprinted persistent XLA cache (utils/xla_cache.py).

Foreign-host XLA:CPU AOT entries load with feature-mismatch warnings and
can mis-execute (SIGILL per the loader's own warning); the helper namespaces
the cache per host so that can never happen.
"""

import os

from deepemia_tpu.utils.xla_cache import (
    host_fingerprint,
    setup_compilation_cache,
)


def test_fingerprint_stable_and_hexlike():
    a, b = host_fingerprint(), host_fingerprint()
    assert a == b
    assert len(a) == 8
    int(a, 16)  # hex


def test_setup_creates_fingerprinted_subdir(tmp_path, monkeypatch):
    monkeypatch.delenv("DEEPEMIA_TPU_TEST_XLA_CACHE", raising=False)
    path = setup_compilation_cache(default_base=str(tmp_path / "base"))
    # conftest already configured the live cache, so jax.config.update may
    # legitimately refuse (returns None); when it succeeds the directory
    # must exist and end with the host fingerprint.
    if path is not None:
        assert os.path.isdir(path)
        assert os.path.basename(path) == host_fingerprint()
        assert os.path.dirname(path) == str(tmp_path / "base")


def test_env_zero_disables(monkeypatch):
    monkeypatch.setenv("DEEPEMIA_TPU_TEST_XLA_CACHE", "0")
    assert setup_compilation_cache() is None


def test_env_overrides_base(tmp_path, monkeypatch):
    monkeypatch.setenv("DEEPEMIA_TPU_TEST_XLA_CACHE", str(tmp_path / "env"))
    path = setup_compilation_cache(default_base="/nonexistent-ignored")
    if path is not None:
        assert path.startswith(str(tmp_path / "env"))
