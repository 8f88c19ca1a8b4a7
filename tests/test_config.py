"""Config system tests: defaults, deep merge, dataset override channels,
validation (parity behaviors from reference src/utils/config.py +
config_validator.py)."""

import yaml

from deepemia_tpu.config import (
    ConfigStore,
    deep_merge,
    default_config,
    validate_config,
)
from deepemia_tpu.utils.exceptions import ConfigurationError


def test_deep_merge_nested_override():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    override = {"a": {"c": 99, "e": 4}, "f": 5}
    merged = deep_merge(base, override)
    assert merged == {"a": {"b": 1, "c": 99, "e": 4}, "d": 3, "f": 5}
    # inputs untouched
    assert base["a"]["c"] == 2 and "f" not in base


def test_default_config_materialized(tmp_home):
    store = ConfigStore()
    cfg = store.load()
    assert store.config_path.exists()
    assert cfg["inference_settings"]["tile_settings"]["tile_size"] == 512
    assert cfg["rcnn_hyperparameters"]["default"]["R50"]["base_lr"] == 0.00025


def test_dataset_override_channels(tmp_home):
    store = ConfigStore()
    store.load()
    ds_dir = store.dataset_config_dir
    ds_dir.mkdir(parents=True, exist_ok=True)
    ds_cfg = {
        "inference_overrides": {
            "class_specific_settings": {"class_0": {"confidence_threshold": 0.9}},
            "tile_settings": {"upscale_factor": 3.5},
        },
        "scale_bar_roi": {"x_start_factor": 0.5},
        "scalebar_thresholds": {"intensity": 55},
        "spatial_constraints": {"enabled": True, "containment_rules": []},
        "rcnn_hyperparameters": {"best_R50": {"base_lr": 0.001}},
    }
    with open(ds_dir / "mydata.yaml", "w") as f:
        yaml.safe_dump(ds_cfg, f)

    merged = store.get("mydata")
    inf = merged["inference_settings"]
    assert inf["class_specific_settings"]["class_0"]["confidence_threshold"] == 0.9
    # non-overridden keys survive the merge
    assert inf["class_specific_settings"]["class_0"]["iou_threshold"] == 0.7
    assert inf["tile_settings"]["upscale_factor"] == 3.5
    assert inf["tile_settings"]["tile_size"] == 512
    assert merged["scale_bar_rois"]["mydata"]["x_start_factor"] == 0.5
    assert merged["scalebar_thresholds"]["intensity"] == 55
    assert merged["scalebar_thresholds"]["merge_gap"] == 15
    assert inf["spatial_constraints"]["mydata"]["enabled"] is True
    assert merged["rcnn_hyperparameters"]["best"]["R50"]["base_lr"] == 0.001
    # base config untouched
    base = store.get()
    assert (
        base["inference_settings"]["class_specific_settings"]["class_0"][
            "confidence_threshold"
        ]
        == 0.5
    )


def test_unknown_dataset_returns_base(tmp_home):
    store = ConfigStore()
    assert store.get("nope") == store.get()


def test_create_dataset_config_from_template(tmp_home):
    store = ConfigStore()
    p = store.create_dataset_config("newds")
    assert p.exists()
    loaded = yaml.safe_load(p.read_text())
    assert loaded["metadata"]["name"] == "newds"
    assert "newds" in store.list_dataset_configs()


def test_validation_rejects_bad_types():
    cfg = default_config()
    cfg["scalebar_thresholds"]["intensity"] = "high"
    try:
        validate_config(cfg, create_dirs=False)
        assert False, "expected ConfigurationError"
    except ConfigurationError:
        pass


def test_validation_fills_defaults():
    out = validate_config(
        {"paths": {"split_dir": "/tmp/x", "category_json": "/tmp/y.json"}},
        create_dirs=False,
    )
    assert out["scalebar_thresholds"]["intensity"] == 100
    assert out["inference_settings"]["tile_settings"]["tile_size"] == 512


def test_dataset_config_direct_inference_settings_merge(tmp_home):
    """A plain ``inference_settings:`` block in a dataset YAML must deep-
    merge (the documented behavior), not just the reference's
    ``inference_overrides`` channel."""
    import os
    from pathlib import Path

    from deepemia_tpu.config import get_config, get_store

    cfg = get_config()
    d = Path(os.path.expanduser(cfg["paths"]["dataset_configs_dir"]))
    d.mkdir(parents=True, exist_ok=True)
    (d / "dsx.yaml").write_text(
        "inference_settings:\n"
        "  tile_settings:\n"
        "    tile_size: 128\n"
        "    tile_batch_size: 4\n"
        "performance:\n"
        "  inference_chips: 2\n"
    )
    get_store().invalidate()
    c = get_config("dsx")
    ts = c["inference_settings"]["tile_settings"]
    assert ts["tile_size"] == 128
    assert ts["tile_batch_size"] == 4
    assert ts["overlap_ratio"] == 0.1  # untouched defaults survive the merge
    assert c["performance"]["inference_chips"] == 2


def test_dataset_train_section_merges(tmp_home):
    """A dataset YAML's train: block (pretrained weights, resize schedule)
    deep-merges into the effective config like any direct key."""
    from deepemia_tpu.config import get_config, get_store

    store = get_store()
    d = store.dataset_config_dir
    d.mkdir(parents=True, exist_ok=True)
    (d / "dstrain.yaml").write_text(
        "train:\n"
        "  pretrained_weights:\n"
        "    R50: /zoo/r50.pkl\n"
        "  resize_mode: range\n"
        "  grad_clip_norm: 1.0\n"
    )
    store.invalidate()
    cfg = get_config("dstrain")
    assert cfg["train"]["pretrained_weights"]["R50"] == "/zoo/r50.pkl"
    assert cfg["train"]["pretrained_weights"]["R101"] == ""  # default kept
    assert cfg["train"]["resize_mode"] == "range"
    assert cfg["train"]["train_size"] == 512  # default kept
    assert cfg["train"]["grad_clip_norm"] == 1.0
