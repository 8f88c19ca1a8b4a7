"""Pipeline-level golden test: zoo-format .pkl -> full InferencePipeline ->
schema-exact measurements_results.csv (VERDICT r3 next #3).

The checkpoint is written in the Detectron2 model-zoo pickle format
({'model': {d2_name: ndarray}}), exercising the conversion path end to end
(models/weights.py load_torch_state_dict -> convert_detectron2_state_dict),
with head weights set so detections are DETERMINISTIC: RPN objectness bias
+4 (every anchor proposes), bbox_pred zeroed (boxes = proposals), cls_score
zeroed (uniform class scores), mask predictor bias +4 (solid masks). The
asserted CSV semantics are the reference's, Q8 quirks included
(/root/reference/src/functions/inference.py:987-1010):
  * 'C. Length' = MIN rect dimension, 'C. Width' = MAX (measurements.py:159-160)
  * RLE CSV named R50_flip_results.csv regardless of model (inference.py:959)
  * 'Detected scale bar' carries the raw OCR value string.
"""

import csv
import json
import os
import pickle
from pathlib import Path

import cv2
import numpy as np
import pytest

GOLDEN_HEADER = [
    "Instance_ID", "Class", "Class_Name", "Major axis length",
    "Minor axis length", "Eccentricity", "C. Length", "C. Width",
    "Circular eq. diameter", "Aspect ratio", "Circularity", "Chord length",
    "Ferret diameter", "Roundness", "Sphericity", "Contrast d10",
    "Contrast d50", "Contrast d90", "Detected scale bar", "File name",
]


@pytest.fixture()
def zoo_pipeline(tmp_home, tmp_path, tiny_r50):
    """Dataset + zoo-pkl checkpoint + one image with a scale bar."""
    from deepemia_tpu.config import get_config
    from deepemia_tpu.models.weights import export_detectron2_state_dict

    model, params = tiny_r50
    sd = export_detectron2_state_dict(params, 50)
    # deterministic-detection head surgery (see module docstring)
    sd["proposal_generator.rpn_head.objectness_logits.bias"] = np.full_like(
        sd["proposal_generator.rpn_head.objectness_logits.bias"], 4.0
    )
    for k in (
        "roi_heads.box_predictor.bbox_pred.weight",
        "roi_heads.box_predictor.bbox_pred.bias",
        "roi_heads.box_predictor.cls_score.weight",
        "roi_heads.box_predictor.cls_score.bias",
    ):
        sd[k] = np.zeros_like(sd[k])
    sd["roi_heads.mask_head.predictor.bias"] = np.full_like(
        sd["roi_heads.mask_head.predictor.bias"], 4.0
    )

    cfg = get_config()
    paths = cfg["paths"]
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Path(os.path.expanduser(paths["category_json"])).write_text(
        json.dumps({"zds": [str(img_dir), str(img_dir), ["particle", "pore"]]})
    )
    split_dir = Path(os.path.expanduser(paths["split_dir"]))
    split_dir.mkdir(parents=True, exist_ok=True)
    (split_dir / "zds_split.json").write_text(json.dumps({"train": [], "test": []}))

    ckpt = split_dir / "zds" / "rcnn_r50" / "model_final_r50.pkl"
    ckpt.parent.mkdir(parents=True, exist_ok=True)
    with open(ckpt, "wb") as f:
        pickle.dump(
            {"model": sd, "__author__": "Detectron2 Model Zoo"}, f, protocol=2
        )

    inf_dir = tmp_path / "INFERENCE"
    inf_dir.mkdir()
    im = np.full((128, 128, 3), 30, np.uint8)
    cv2.circle(im, (40, 50), 16, (220, 220, 220), -1)
    # scale bar: 50-px line + '2 um' label in the configured ROI
    cv2.rectangle(im, (60, 118), (109, 120), (255, 255, 255), -1)
    cv2.putText(
        im, "2 um", (60, 112), cv2.FONT_HERSHEY_SIMPLEX, 0.45,
        (255, 255, 255), 1, cv2.LINE_AA,
    )
    cv2.imwrite(str(inf_dir / "micro.png"), im)

    cfg["scale_bar_rois"] = {
        "default": {
            "x_start_factor": 0.3,
            "y_start_factor": 0.7,
            "width_factor": 0.7,
            "height_factor": 0.3,
        }
    }
    cfg["scalebar_thresholds"]["min_line_length"] = 30
    cfg["scalebar_thresholds"]["edge_margin_factor"] = 0.0
    inf = cfg["inference_settings"]
    inf["use_tile_based_inference"] = False
    inf["use_class_specific_inference"] = False
    inf["ensemble_settings"] = {"enabled": False}
    inf["postprocessing"] = {"enabled": False}
    return {
        "cfg": cfg,
        "split_dir": str(split_dir),
        "inf_dir": str(inf_dir),
        "out_dir": str(tmp_path / "out"),
    }


@pytest.mark.compiles
def test_zoo_pkl_full_pipeline_golden_csv(zoo_pipeline):
    from deepemia_tpu.inference.pipeline import InferencePipeline

    pipe = InferencePipeline(
        "zds",
        zoo_pipeline["split_dir"],
        output_dir=zoo_pipeline["out_dir"],
        config=zoo_pipeline["cfg"],
        use_bf16=False,
        default_threshold=0.2,
    )
    res = pipe.run(zoo_pipeline["inf_dir"], visualize=False)
    assert res["processed"] == ["micro.png"] and not res["failed"]

    with open(res["measurements_csv"]) as f:
        rows = list(csv.reader(f))
    assert rows[0] == GOLDEN_HEADER
    data = [dict(zip(GOLDEN_HEADER, r)) for r in rows[1:]]
    assert data, "deterministic heads must yield at least one instance"
    # Instance_ID parity: ids enumerate the detected masks 1..N; a mask
    # whose contours are all area-filtered consumes its id without a row
    # (gaps), and a multi-contour mask writes one row PER kept contour
    # under the same id (duplicates) — reference inference.py:1148
    # enumerate(..., 1), area gate :1188, per-contour row :1210
    ids = [int(r["Instance_ID"].rsplit("_", 1)[1]) for r in data]
    assert ids == sorted(ids) and ids[0] >= 1
    for row in data:
        assert row["Instance_ID"].startswith("micro.png_")
        assert row["Class_Name"] in ("particle", "pore")
        assert row["File name"] == "micro.png"
        # Q8: C. Length = MIN rect dim, C. Width = MAX
        assert float(row["C. Length"]) <= float(row["C. Width"]) + 1e-6
        # scale-bar OCR value propagated verbatim into every row
        assert row["Detected scale bar"] == "2"
        assert float(row["Circular eq. diameter"]) > 0

    # calibration actually applied: 50-px bar labeled 2 um -> 0.04 um/px;
    # measured dimensions must be in micrometres (image is 128 px wide, so
    # no dimension can exceed 128 * 0.04 = 5.12 um)
    assert all(float(r["C. Width"]) <= 5.2 for r in data)

    # Q8: RLE CSV keeps the reference's fixed name, 1-indexed column-major
    rle_csv = Path(res["output_dir"]) / "R50_flip_results.csv"
    assert str(rle_csv) == res["rle_csv"] and rle_csv.exists()
    with open(rle_csv) as f:
        rle_rows = list(csv.reader(f))
    assert rle_rows[0] == ["ImageId", "EncodedPixels"]
    # one RLE row per valid instance (no contour/area filtering there), so
    # it bounds the measurement ids from above
    n_rle = len(rle_rows) - 1
    assert n_rle >= len(set(ids)) and max(ids) <= n_rle
    nonempty = 0
    for name, enc in rle_rows[1:]:
        assert name == "micro.png"
        vals = [int(t) for t in enc.split()]
        # an empty encoding is legal (valid instance, empty thresholded
        # mask — the reference writes the row regardless, inference.py:917)
        assert len(vals) % 2 == 0
        if vals:
            nonempty += 1
        starts, lengths = vals[0::2], vals[1::2]
        assert all(s >= 1 for s in starts)  # 1-indexed
        assert all(
            s + ln - 1 <= 128 * 128 for s, ln in zip(starts, lengths)
        )
    assert nonempty >= len(set(ids))  # every measured mask has pixels
