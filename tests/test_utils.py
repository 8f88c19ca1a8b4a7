"""Tests for ETA tracking, safe file ops, storage, exceptions."""

import os
from pathlib import Path

import pytest

from deepemia_tpu.utils.eta import estimate_eta, read_eta_data, update_eta_data
from deepemia_tpu.utils.exceptions import ConfigurationError, PipelineError
from deepemia_tpu.utils.safe_ops import safe_remove_files, validate_path_safety
from deepemia_tpu.utils.storage import LocalStorage, StorageError, with_retry


def test_exception_formatting():
    e = PipelineError("boom", stage="inference", details={"image": "a.tif"})
    s = str(e)
    assert "boom" in s and "inference" in s and "a.tif" in s
    assert isinstance(ConfigurationError("x"), PipelineError)


def test_eta_half_weight_update(tmp_path):
    f = str(tmp_path / "eta.json")
    data = read_eta_data(f)
    assert data["inference"]["average_time_per_image"] == 10.0
    update_eta_data(f, "prepare", 40.0)
    data = read_eta_data(f)
    assert data["prepare"]["average_time"] == pytest.approx((20.0 + 40.0) / 2)
    update_eta_data(f, "inference", 30.0, num_images=10)
    data = read_eta_data(f)
    assert data["inference"]["average_time_per_image"] == pytest.approx(
        (10.0 + 3.0) / 2
    )
    eta = estimate_eta(f, "inference", num_images=4)
    assert eta == pytest.approx(6.5 * 4 * 1.1)


def test_safe_ops_blocks_traversal(tmp_path):
    inside = tmp_path / "keep" / "x.txt"
    inside.parent.mkdir()
    inside.write_text("hi")
    outside = tmp_path.parent / "escape.txt"
    with pytest.raises(ValueError):
        validate_path_safety(str(outside), [str(tmp_path)])
    removed = safe_remove_files(
        [str(inside), str(outside)], allowed_bases=[str(tmp_path)]
    )
    assert [p.name for p in removed] == ["x.txt"]
    assert not inside.exists()


def test_local_storage_roundtrip(tmp_path):
    store = LocalStorage(tmp_path / "bucket")
    ds = tmp_path / "ds"
    (ds / "sub").mkdir(parents=True)
    (ds / "a.tif").write_text("img")
    (ds / "sub" / "b.json").write_text("{}")
    store.upload_tree(ds, "DATASET/myds")
    out = tmp_path / "restored"
    store.download_dataset("myds", out)
    assert (out / "a.tif").read_text() == "img"
    assert (out / "sub" / "b.json").exists()
    with pytest.raises(StorageError):
        store.download_dataset("missing", tmp_path / "x")


def test_upload_inference_results_selective(tmp_path):
    store = LocalStorage(tmp_path / "bucket")
    res = tmp_path / "results"
    res.mkdir()
    (res / "measurements_results.csv").write_text("csv")
    (res / "overlay.png").write_text("png")
    (res / "junk.bin").write_text("junk")
    uploaded = store.upload_inference_results(res, timestamp="TS")
    names = {p.name for p in uploaded}
    assert names == {"measurements_results.csv", "overlay.png"}
    archived = list((tmp_path / "bucket" / "Archive" / "TS").iterdir())
    assert any(p.name == "upload_summary.txt" for p in archived)


def test_with_retry_eventual_success():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")

    with_retry(flaky, attempts=3, base_delay=0.0)
    assert calls["n"] == 2
    with pytest.raises(StorageError):
        with_retry(
            lambda: (_ for _ in ()).throw(RuntimeError("always")),
            attempts=2,
            base_delay=0.0,
        )


def test_color_wavelength_helpers():
    from deepemia_tpu.utils.color import hue_to_wavelength, rgb_to_hsv, rgb_to_wavelength

    # pure red: hue 0 -> 620 nm
    assert rgb_to_wavelength(255, 0, 0) == pytest.approx(620.0)
    # pure green: hue 120 deg -> cv2 convention 60 -> 582.2 nm
    h, s, v = rgb_to_hsv(0, 255, 0)
    assert h == pytest.approx(60.0)
    assert rgb_to_wavelength(0, 255, 0) == pytest.approx(620.0 - 170.0 / 270.0 * 60.0)
    with pytest.raises(ValueError):
        hue_to_wavelength(300.0)


def test_preflight_probe_hang_raises(monkeypatch):
    """A hung backend init (dead TPU tunnel: jax.devices() blocks forever
    in-process) must surface as a clear preflight error, not a wedge."""
    import pytest

    from deepemia_tpu.utils import device
    from deepemia_tpu.utils.exceptions import PipelineError

    monkeypatch.setattr(
        device, "init_backend_watchdog", lambda timeout_s=None: None
    )
    monkeypatch.setenv("JAX_PLATFORMS", "")
    with pytest.raises(PipelineError, match="unreachable"):
        device.check_accelerator_availability(interactive=False)


def test_preflight_cpu_env_skips_probe(monkeypatch):
    """JAX_PLATFORMS=cpu cannot hang: the init watchdog must be skipped."""
    from deepemia_tpu.utils import device

    called = []
    monkeypatch.setattr(
        device, "init_backend_watchdog",
        lambda timeout_s=None: called.append(1) or True,
    )
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    device.check_accelerator_availability(interactive=False)
    assert not called


def test_init_backend_watchdog_healthy():
    """With JAX already initialized in-process the watchdog returns True
    immediately (it shares the process's one real init)."""
    from deepemia_tpu.utils import device

    assert device.init_backend_watchdog(timeout_s=30.0) is True


def test_probe_backend_subprocess_cpu():
    """The shared subprocess probe reports (True, platform) on a healthy
    CPU backend — bench.py's retry loop builds on this contract."""
    from deepemia_tpu.utils import device

    ok, detail = device.probe_backend(timeout_s=120.0)
    assert ok is True
    assert detail == "cpu"


class _FakeBlob:
    """In-memory stand-in for google.cloud.storage.Blob."""

    def __init__(self, store, name):
        self._store = store
        self.name = name

    def upload_from_filename(self, path):
        with open(path, "rb") as f:
            self._store[self.name] = f.read()

    def download_to_filename(self, path):
        if self.name not in self._store:
            raise RuntimeError(f"no such blob {self.name}")
        with open(path, "wb") as f:
            f.write(self._store[self.name])

    def delete(self):
        del self._store[self.name]


class _FakeBucket:
    def __init__(self, store):
        self._store = store

    def blob(self, name):
        return _FakeBlob(self._store, name)

    def list_blobs(self, prefix=""):
        return [
            _FakeBlob(self._store, n)
            for n in sorted(self._store)
            if n.startswith(prefix)
        ]


class _FakeGcsClient:
    def __init__(self, store):
        self._store = store

    def bucket(self, name):
        return _FakeBucket(self._store)


def test_gcs_client_storage_roundtrip(tmp_path):
    from deepemia_tpu.utils.storage import GcsClientStorage

    blobs = {}
    store = GcsClientStorage("bkt", client=_FakeGcsClient(blobs))
    ds = tmp_path / "ds"
    (ds / "sub").mkdir(parents=True)
    (ds / "a.tif").write_text("img")
    (ds / "sub" / "b.json").write_text("{}")
    store.upload_tree(ds, "DATASET/myds")
    assert set(blobs) == {"DATASET/myds/a.tif", "DATASET/myds/sub/b.json"}
    assert store.list_prefix("DATASET/myds") == sorted(blobs)

    out = tmp_path / "restored"
    store.download_dataset("myds", out)
    assert (out / "a.tif").read_text() == "img"
    assert (out / "sub" / "b.json").exists()
    with pytest.raises(StorageError):
        store.download_dataset("missing", tmp_path / "x")

    # single-file ops + selective results upload via the shared base class
    res = tmp_path / "results"
    res.mkdir()
    (res / "measurements_results.csv").write_text("csv")
    (res / "junk.bin").write_text("junk")
    uploaded = store.upload_inference_results(res, timestamp="TS")
    assert [p.name for p in uploaded] == ["measurements_results.csv"]
    assert "Archive/TS/measurements_results.csv" in blobs
    assert "Archive/TS/upload_summary.txt" in blobs
    assert not any("junk" in n for n in blobs)

    # wipe-then-upload (GUI replace-contents semantics)
    ds2 = tmp_path / "ds2"
    ds2.mkdir()
    (ds2 / "only.txt").write_text("new")
    store.upload_tree_wipe(ds2, "DATASET/myds")
    assert store.list_prefix("DATASET/myds") == ["DATASET/myds/only.txt"]


def test_local_storage_list_and_wipe(tmp_path):
    store = LocalStorage(tmp_path / "bucket")
    d = tmp_path / "d"
    d.mkdir()
    (d / "x.txt").write_text("1")
    store.upload_tree(d, "P/one")
    assert store.list_prefix("P") == ["P/one/x.txt"]
    assert store.delete_prefix("P/one") == 1
    assert store.list_prefix("P") == []


def test_storage_from_config_client_fallback(tmp_path, monkeypatch):
    """bucket set + no gsutil + client importable -> GcsClientStorage."""
    import sys
    import types

    import deepemia_tpu.utils.storage as st

    monkeypatch.setattr(st.shutil, "which", lambda name: None)
    created = {}

    class _Client:
        def __init__(self):
            created["yes"] = True

        def bucket(self, name):
            return _FakeBucket({})

    gcs_mod = types.ModuleType("google.cloud.storage")
    gcs_mod.Client = _Client
    cloud_mod = types.ModuleType("google.cloud")
    cloud_mod.storage = gcs_mod
    google_mod = types.ModuleType("google")
    google_mod.cloud = cloud_mod
    monkeypatch.setitem(sys.modules, "google", google_mod)
    monkeypatch.setitem(sys.modules, "google.cloud", cloud_mod)
    monkeypatch.setitem(sys.modules, "google.cloud.storage", gcs_mod)

    out = st.storage_from_config({"bucket": "bkt"})
    assert isinstance(out, st.GcsClientStorage)
    assert created.get("yes")

    # no bucket -> local store under the framework home
    monkeypatch.setenv("DEEPEMIA_TPU_HOME", str(tmp_path / "home"))
    import deepemia_tpu.config.config as cfg

    cfg._default_store = None
    out2 = st.storage_from_config({})
    assert isinstance(out2, st.LocalStorage)
    cfg._default_store = None
