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
