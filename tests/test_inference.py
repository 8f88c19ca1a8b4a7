"""Inference-stack tests: dedup/constraints on padded InstanceSets, scale-bar
detection on synthetic images, and the full pipeline end-to-end on CPU with a
tiny random-weights model (SURVEY.md §4 test strategy)."""

import json
import os
from pathlib import Path

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.inference.constraints import apply_spatial_constraints, spec_from_config
from deepemia_tpu.inference.detections import (
    InstanceSet,
    concat_instances,
    dedup_by_mask_iou,
    empty_instances,
)


def _inst(boxes, scores, classes, cap=8, mask_res=28):
    k = len(boxes)
    out = empty_instances(cap, mask_res)
    return out._replace(
        boxes=out.boxes.at[:k].set(jnp.asarray(boxes, jnp.float32)),
        scores=out.scores.at[:k].set(jnp.asarray(scores, jnp.float32)),
        classes=out.classes.at[:k].set(jnp.asarray(classes, jnp.int32)),
        valid=out.valid.at[:k].set(True),
        mask_probs=out.mask_probs.at[:k].set(1.0),  # full-box masks
    )


def test_concat_keeps_top_by_score():
    a = _inst([[0, 0, 10, 10]], [0.9], [0], cap=2)
    b = _inst([[20, 20, 30, 30], [40, 40, 50, 50]], [0.8, 0.7], [1, 1], cap=2)
    merged = concat_instances([a, b], capacity=2)
    assert int(merged.valid.sum()) == 2
    assert sorted(np.asarray(merged.scores)[np.asarray(merged.valid)].tolist()) == [
        pytest.approx(0.8),
        pytest.approx(0.9),
    ]


def test_dedup_by_mask_iou_removes_duplicates():
    # two identical boxes same class, one shifted far away
    inst = _inst(
        [[10, 10, 40, 40], [10, 10, 40, 40], [60, 60, 90, 90]],
        [0.9, 0.8, 0.7],
        [0, 0, 0],
    )
    out = dedup_by_mask_iou(inst, (100, 100), 0.4, stride=2)
    assert int(out.valid.sum()) == 2
    # different classes are not deduped when class_aware
    inst2 = _inst([[10, 10, 40, 40], [10, 10, 40, 40]], [0.9, 0.8], [0, 1])
    out2 = dedup_by_mask_iou(inst2, (100, 100), 0.4, stride=2, class_aware=True)
    assert int(out2.valid.sum()) == 2


def test_spatial_constraints_overlap_and_containment():
    spec = spec_from_config(
        {
            "enabled": True,
            "containment_threshold": 0.9,
            "overlap_rules": {"class_0": {"allow_overlap": False, "max_iou_threshold": 0.3}},
            "containment_rules": {"class_1": 0},
        },
        num_classes=2,
    )
    # two overlapping class-0 (one must go), one class-1 inside a class-0
    # parent, one class-1 orphan outside any parent
    inst = _inst(
        [
            [10, 10, 50, 50],  # class 0 parent (keep)
            [12, 12, 52, 52],  # class 0 heavy overlap (drop)
            [20, 20, 30, 30],  # class 1 contained (keep)
            [70, 70, 90, 90],  # class 1 orphan (drop)
        ],
        [0.9, 0.8, 0.9, 0.9],
        [0, 0, 1, 1],
    )
    out = apply_spatial_constraints(inst, (100, 100), spec, stride=2)
    valid = np.asarray(out.valid)
    assert valid.tolist() == [True, False, True, False, False, False, False, False]


def test_spatial_constraints_disabled_noop():
    spec = spec_from_config({"enabled": False}, 2)
    inst = _inst([[0, 0, 10, 10]], [0.5], [0])
    out = apply_spatial_constraints(inst, (50, 50), spec)
    assert int(out.valid.sum()) == 1


def test_device_rle_overflow_falls_back_exact():
    """A fragmented mask that exceeds the device run capacity must round-trip
    exactly via the host fallback (VERDICT r2 weak #3: truncated RLE rows
    were written silently)."""
    from deepemia_tpu.inference.pipeline import InferencePipeline
    from deepemia_tpu.ops.rle import rle_decode, rle_encode

    pipe = InferencePipeline.__new__(InferencePipeline)
    pipe.mask_threshold = 0.5

    hw = (64, 64)
    cap = 2
    inst = empty_instances(cap, mask_res=28)
    # alternating-row probabilities -> pasted mask is horizontal stripes;
    # column-major RLE then needs ~h/2 runs per column >> 4*max(h,w)
    stripes = jnp.tile(
        jnp.array([[1.0], [0.0]], jnp.float32), (14, 28)
    )  # [28,28] rows alternate
    inst = inst._replace(
        boxes=inst.boxes.at[0].set(jnp.array([0.0, 0.0, 64.0, 64.0])),
        valid=inst.valid.at[0].set(True),
        mask_probs=inst.mask_probs.at[0].set(stripes),
    )

    starts, lengths, n_runs, max_runs = pipe._device_rle(inst, hw)
    assert int(np.asarray(n_runs)[0]) >= max_runs  # capacity actually hit

    m = pipe._full_mask_one(inst, 0, hw)
    assert m.shape == hw and m.any()
    rle = rle_encode(m)
    np.testing.assert_array_equal(rle_decode(rle, hw), m)


def test_scalebar_detection_synthetic():
    from deepemia_tpu.inference.scalebar import detect_scale_bar

    img = np.zeros((400, 800, 3), np.uint8)
    # bright 200px bar in the default ROI (x>=560, y in [20,40))
    cv2.rectangle(img, (580, 26), (779, 30), (255, 255, 255), -1)
    cv2.putText(img, "500", (600, 22), cv2.FONT_HERSHEY_SIMPLEX, 0.6,
                (255, 255, 255), 2, cv2.LINE_AA)
    cfg = {
        "scale_bar_rois": {
            "default": {
                "x_start_factor": 0.7,
                "y_start_factor": 0.0,
                "width_factor": 0.3,
                "height_factor": 0.1,
            }
        },
        "scalebar_thresholds": {"intensity": 100, "merge_gap": 15,
                                 "min_line_length": 30, "edge_margin_factor": 0.0},
    }
    psum, um_pix = detect_scale_bar(img, cfg)
    assert psum == "500"
    assert um_pix == pytest.approx(500.0 / 200.0, rel=0.05)

    # fallback on blank image
    psum2, um2 = detect_scale_bar(np.zeros((100, 100, 3), np.uint8), cfg)
    assert (psum2, um2) == ("0", 1.0)


@pytest.fixture()
def tiny_dataset(tmp_home, tmp_path):
    """A registered dataset + random-weights orbax checkpoint + 2 images."""
    from deepemia_tpu.config import get_config, get_store
    from deepemia_tpu.data.models import save_orbax_checkpoint
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    cfg = get_config()
    paths = cfg["paths"]
    # dataset_info.json
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Path(os.path.expanduser(paths["category_json"])).write_text(
        json.dumps({"tinyds": [str(img_dir), str(img_dir), ["particle", "pore"]]})
    )
    # split file (pre-made so registration does not re-split)
    split_dir = Path(os.path.expanduser(paths["split_dir"]))
    split_dir.mkdir(parents=True, exist_ok=True)
    (split_dir / "tinyds_split.json").write_text(
        json.dumps({"train": [], "test": []})
    )
    # checkpoint
    model = build_model("R50", num_classes=2, use_bf16=False)
    params = init_params(model, (64, 64), seed=3)
    ckpt_dir = split_dir / "tinyds" / "rcnn_r50" / "model_final_r50.orbax"
    save_orbax_checkpoint(params, str(ckpt_dir), "R50", 2)
    # inference images: blobs on dark background
    inf_dir = tmp_path / "INFERENCE"
    inf_dir.mkdir()
    for i in range(2):
        im = np.full((128, 128, 3), 30, np.uint8)
        cv2.circle(im, (40 + 10 * i, 60), 18, (220, 220, 220), -1)
        cv2.circle(im, (90, 40 + 20 * i), 12, (200, 200, 200), -1)
        cv2.imwrite(str(inf_dir / f"img{i}.png"), im)
    return {"split_dir": str(split_dir), "inference_dir": str(inf_dir)}


def test_geometry_knobs_config_plumbing(tiny_dataset):
    """full_pass_max_dim / dedup_stride / instance_capacity /
    measurement_window reach the engine+pipeline from YAML-shaped config
    with no source edits (VERDICT r2 weak #5: an 8k-micrograph or
    >192-px-object user must be able to tune these)."""
    from deepemia_tpu.config import get_config
    from deepemia_tpu.inference.pipeline import InferencePipeline

    cfg = get_config()
    cfg["inference_settings"]["tile_settings"].update(
        full_pass_max_dim=8192, dedup_stride=4, instance_capacity=128
    )
    cfg["inference_settings"]["measurement_window"] = 384
    pipe = InferencePipeline(
        "tinyds", tiny_dataset["split_dir"], config=cfg, use_bf16=False
    )
    eng = pipe.engines[0][1]
    assert eng.full_pass_max_dim == 8192
    assert eng.dedup_stride == 4
    assert eng.capacity == 128
    assert pipe.measurement_window == 384


def test_classes_using_tiling_exclusion_warns(tiny_dataset, caplog):
    """Enforcing classes_using_tiling is a deliberate improvement over the
    reference (which parses but ignores it) — but a stale config listing a
    subset of the classes must warn loudly, not silently drop tile
    detections of the rest."""
    import logging

    from deepemia_tpu.config import get_config
    from deepemia_tpu.inference.pipeline import InferencePipeline

    cfg = get_config()
    cfg["inference_settings"]["tile_settings"]["classes_using_tiling"] = [0]
    with caplog.at_level(logging.WARNING, logger="deepemia_tpu.pipeline"):
        InferencePipeline(
            "tinyds", tiny_dataset["split_dir"], config=cfg, use_bf16=False
        )
    assert any(
        "classes_using_tiling" in r.message and "[1]" in r.message
        for r in caplog.records
    ), [r.message for r in caplog.records]

    # full coverage -> no warning
    caplog.clear()
    cfg["inference_settings"]["tile_settings"]["classes_using_tiling"] = [0, 1]
    with caplog.at_level(logging.WARNING, logger="deepemia_tpu.pipeline"):
        InferencePipeline(
            "tinyds", tiny_dataset["split_dir"], config=cfg, use_bf16=False
        )
    assert not [
        r for r in caplog.records if "classes_using_tiling" in r.message
    ]


def test_train_resize_range_mode(tmp_path):
    """'range' resize samples Detectron2's shortest-edge schedule inside the
    static canvas: content scale varies run to run, canvas shape does not."""
    import cv2 as _cv2

    from deepemia_tpu.data.loader import prepare_sample

    im = np.full((300, 400, 3), 30, np.uint8)
    _cv2.rectangle(im, (100, 100), (200, 180), (220, 220, 220), -1)
    p = tmp_path / "img.png"
    _cv2.imwrite(str(p), im)
    rec = {
        "file_name": str(p),
        "height": 300,
        "width": 400,
        "annotations": [
            {
                "bbox": [100, 100, 200, 180],
                "bbox_mode": "XYXY_ABS",
                "segmentation": [[100, 100, 200, 100, 200, 180, 100, 180]],
                "category_id": 0,
            }
        ],
    }
    sizes = set()
    for seed in range(6):
        rng = np.random.default_rng(seed)
        s = prepare_sample(
            rec, 1024, 8, False, rng,
            resize_mode="range", min_size_range=(640, 800), max_size=1333,
        )
        assert s["image"].shape == (1024, 1024, 3)  # static canvas
        box = s["gt_boxes"][0]
        sizes.add(round(float(box[2] - box[0])))
        # shortest-edge semantics: scale = chosen/300 in [640/300, 800/300],
        # long side 400*scale <= 1024 -> box width 100*scale in [213, 267]
        assert 210 <= box[2] - box[0] <= 270
    assert len(sizes) > 1  # the schedule actually varies

    # fixed mode unchanged: long side 400 -> scale 2.56
    s = prepare_sample(rec, 1024, 8, False, np.random.default_rng(0))
    box = s["gt_boxes"][0]
    assert abs((box[2] - box[0]) - 100 * (1024 / 400)) < 4


def test_classes_needing_upscale_absolute_cutoff():
    """The upscale decision uses an absolute area cutoff, NOT the
    percentile-relative small_classes rule (which marks ~half the classes
    small whenever anything is detected, making native serving dead code)."""
    from deepemia_tpu.inference.multiscale import (
        classes_needing_upscale,
        determine_small_classes,
    )

    all_large = {0: 5000.0, 1: 20000.0}
    # percentile rule: class 0 is "small" relative to class 1...
    assert determine_small_classes(all_large) == {0}
    # ...but neither is below 32^2, so no upscale is needed
    assert classes_needing_upscale(all_large) == set()
    assert classes_needing_upscale({0: 900.0, 1: 20000.0}) == {0}
    assert classes_needing_upscale({}) == set()
    assert classes_needing_upscale({0: 5000.0}, min_area=6000.0) == {0}


def test_class_conditional_upscale_logic(tiny_dataset):
    """No class below the absolute small-area cutoff -> tiles run native
    (upscale 1.0); with small classes (or no heuristic) the configured
    upscale stays in force (VERDICT r2 next #3)."""
    from deepemia_tpu.inference.detections import empty_instances
    from deepemia_tpu.inference.pipeline import InferencePipeline

    pipe = InferencePipeline("tinyds", tiny_dataset["split_dir"], use_bf16=False)
    pipe.postproc_enabled = False
    pipe.use_multiscale = False  # exercise the tile-engine path
    captured = {}
    _, engine, _ = pipe.engines[0]

    def spy(image, settings, upscale=None):
        captured["upscale"] = upscale
        return empty_instances(engine.capacity), 1.0

    engine.infer = spy
    img = np.zeros((128, 128, 3), np.uint8)

    pipe._heuristic_valid = True
    pipe.upscale_classes = set()
    pipe._infer_one(img)
    assert captured["upscale"] == 1.0, (
        pipe.class_conditional_upscale, pipe._heuristic_valid,
        pipe.upscale_classes, pipe.use_ensemble, pipe.use_multiscale,
    )

    # the percentile-relative set must NOT disable native serving
    pipe.small_classes = {1}
    pipe._infer_one(img)
    assert captured["upscale"] == 1.0

    pipe.upscale_classes = {1}
    pipe._infer_one(img)
    assert captured["upscale"] is None

    pipe.upscale_classes = set()
    pipe._heuristic_valid = False  # heuristic never ran: stay conservative
    pipe._infer_one(img)
    assert captured["upscale"] is None

    pipe._heuristic_valid = True
    pipe.class_conditional_upscale = False  # opt-out knob
    pipe._infer_one(img)
    assert captured["upscale"] is None


def test_size_heuristic_zero_detections_keeps_upscale(tiny_dataset, monkeypatch):
    """A heuristic sample with no confident detections establishes nothing:
    the configured upscale must stay in force (small objects may be exactly
    what the sample failed to see at native resolution)."""
    from deepemia_tpu.inference import multiscale
    from deepemia_tpu.inference.pipeline import InferencePipeline

    pipe = InferencePipeline("tinyds", tiny_dataset["split_dir"], use_bf16=False)
    pipe.postproc_enabled = True
    monkeypatch.setattr(
        multiscale, "calculate_average_mask_sizes",
        lambda engine, paths, settings, **kw: {},
    )
    pipe.ensure_size_heuristics(
        tiny_dataset["inference_dir"],
        sorted(os.listdir(tiny_dataset["inference_dir"])),
    )
    assert pipe._heuristics_done
    assert not pipe._heuristic_valid
    assert pipe.upscale_classes == set()


@pytest.mark.compiles
def test_pipeline_end_to_end(tiny_dataset):
    from deepemia_tpu.inference.pipeline import InferencePipeline

    pipe = InferencePipeline("tinyds", tiny_dataset["split_dir"], use_bf16=False)
    # disable tiling for speed at 128x128 (tile 512 > image anyway)
    result = pipe.run(tiny_dataset["inference_dir"], visualize=True)
    assert result["failed"] == []
    assert len(result["processed"]) == 2
    meas = Path(result["measurements_csv"]).read_text().splitlines()
    assert meas[0].startswith("Instance_ID,Class,Class_Name")
    rle = Path(result["rle_csv"]).read_text().splitlines()
    assert rle[0] == "ImageId,EncodedPixels"
    # legend + overlays written
    out = Path(result["output_dir"])
    assert (out / "class_legend.png").exists()
    assert (out / "img0.png_predictions.png").exists()
