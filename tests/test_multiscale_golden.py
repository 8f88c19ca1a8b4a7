"""Multiscale-mode integration test + golden CSV schema guard."""

import csv
import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.inference.engine import ClassSettings, TileEngine
from deepemia_tpu.inference.measure import CSV_HEADER, measurement_rows
from deepemia_tpu.inference.multiscale import run_multiscale_inference
from deepemia_tpu.models.mask_rcnn import build_model, init_params

# the reference measurements_results.csv header (inference.py:987-1010)
GOLDEN_HEADER = [
    "Instance_ID", "Class", "Class_Name", "Major axis length",
    "Minor axis length", "Eccentricity", "C. Length", "C. Width",
    "Circular eq. diameter", "Aspect ratio", "Circularity", "Chord length",
    "Ferret diameter", "Roundness", "Sphericity", "Contrast d10",
    "Contrast d50", "Contrast d90", "Detected scale bar", "File name",
]


def test_csv_header_matches_reference_schema():
    assert CSV_HEADER == GOLDEN_HEADER


def test_measurement_row_golden_values():
    """Deterministic instance -> known measurement row (schema + formulas).

    A 21x21 axis-aligned square at um_pix=2: rect dims 20x20, polygon area
    400, perimeter 80 -> all Q8 formulas have closed forms.
    """
    from deepemia_tpu.inference.detections import empty_instances
    from deepemia_tpu.inference.measure import measure_instances_device

    inst = empty_instances(4)
    inst = inst._replace(
        mask_probs=inst.mask_probs.at[0].set(1.0),
        boxes=inst.boxes.at[0].set(jnp.asarray([10.0, 10.0, 31.0, 31.0])),
        classes=inst.classes.at[0].set(1),
        valid=inst.valid.at[0].set(True),
    )
    image = jnp.zeros((64, 64, 3), jnp.float32)
    meas = measure_instances_device(inst, image)
    rows = measurement_rows(
        {k: np.asarray(v) for k, v in meas.items()},
        inst,
        "img.png",
        ["particle", "pore"],
        um_pix=2.0,
        psum="500",
        image_area=64 * 64,
    )
    assert len(rows) == 1
    row = dict(zip(GOLDEN_HEADER, rows[0]))
    assert row["Instance_ID"] == "img.png_1"
    assert row["Class"] == 1 and row["Class_Name"] == "pore"
    # square: C. Length == C. Width == 20px * 2um (support-scan tolerance)
    assert row["C. Length"] == pytest.approx(40.0, rel=0.03)
    assert row["C. Width"] == pytest.approx(40.0, rel=0.03)
    assert row["Aspect ratio"] == pytest.approx(1.0, rel=0.02)
    assert row["Roundness"] == pytest.approx(1.0, rel=0.02)
    # polygon area 400 -> CircularED = sqrt(4*400/pi)*2
    assert row["Circular eq. diameter"] == pytest.approx(
        np.sqrt(4 * 400 / np.pi) * 2, rel=0.02
    )
    # Chord length = perimeter(80) * 2 (Q8)
    assert row["Chord length"] == pytest.approx(160.0, rel=0.03)
    assert row["Detected scale bar"] == "500"
    assert row["File name"] == "img.png"


@pytest.mark.slow
def test_multiscale_mode_runs_and_merges(rng):
    model = build_model("R50", num_classes=2, use_bf16=False)
    params = init_params(model, (64, 64), seed=7)
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    engine = TileEngine(model, params, use_tiling=False, capacity=64)
    img = (rng.random((100, 140, 3)) * 255).astype(np.uint8)
    inst, quality = run_multiscale_inference(
        engine, img, settings, scales=(0.7, 1.0), max_scale=2.0
    )
    assert 0.0 <= quality <= 1.0
    boxes = np.asarray(inst.boxes)[np.asarray(inst.valid)]
    if len(boxes):
        # boxes mapped back into original image coordinates
        assert boxes[:, 2].max() <= 140.5 and boxes[:, 3].max() <= 100.5
