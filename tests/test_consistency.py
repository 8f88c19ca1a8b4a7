"""Cross-backend consistency: device vs host measurements, bf16 vs f32
model outputs, full-pass guard behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.inference.detections import empty_instances
from deepemia_tpu.inference.measure import measure_instances_device, measurement_rows
from deepemia_tpu.inference.measure_host import measurement_rows_host
from deepemia_tpu.ops.masks import paste_masks


def _disk_instance(cap=4):
    """One disk instance encoded as RoI probs + box."""
    import cv2

    inst = empty_instances(cap)
    probs = np.zeros((28, 28), np.float32)
    cv2.circle(probs, (14, 14), 12, 1.0, -1)
    inst = inst._replace(
        mask_probs=inst.mask_probs.at[0].set(jnp.asarray(probs)),
        boxes=inst.boxes.at[0].set(jnp.asarray([30.0, 20.0, 86.0, 76.0])),
        classes=inst.classes.at[0].set(0),
        valid=inst.valid.at[0].set(True),
    )
    return inst


def test_device_vs_host_measurements_agree():
    """The on-device morphometrics and the native-C++ contour path must
    agree on the same pasted mask within the documented tolerances."""
    inst = _disk_instance()
    h = w = 128
    image = jnp.zeros((h, w, 3), jnp.float32)

    meas = measure_instances_device(inst, image)
    dev_rows = measurement_rows(
        {k: np.asarray(v) for k, v in meas.items()},
        inst, "x.png", ["a"], 1.0, "0", float(h * w),
    )
    masks = np.asarray(paste_masks(inst.mask_probs, inst.boxes, h, w))
    host_rows = measurement_rows_host(
        masks, np.asarray(inst.classes), np.asarray(inst.valid),
        "x.png", ["a"], 1.0, "0", float(h * w),
    )
    assert len(dev_rows) == len(host_rows) == 1
    from deepemia_tpu.inference.measure import CSV_HEADER

    dev = dict(zip(CSV_HEADER, dev_rows[0]))
    host = dict(zip(CSV_HEADER, host_rows[0]))
    # perimeter-derived columns (Chord/Circularity/Sphericity) get a wider
    # band: the device estimator overcounts on threshold-ragged pasted
    # boundaries (up to ~6%; the host backend is the exact-parity path —
    # see docs/parity.md)
    for col, tol in [
        ("C. Length", 0.04), ("C. Width", 0.04),
        ("Circular eq. diameter", 0.03), ("Chord length", 0.07),
        ("Ferret diameter", 0.04), ("Major axis length", 0.08),
        ("Minor axis length", 0.08), ("Aspect ratio", 0.04),
        ("Circularity", 0.14), ("Sphericity", 0.07),
    ]:
        assert dev[col] == pytest.approx(host[col], rel=tol), (
            f"{col}: device {dev[col]} vs host {host[col]}"
        )


@pytest.mark.slow
def test_bf16_vs_f32_detection_consistency(rng):
    """bfloat16 compute must not change WHICH objects are found (scores may
    drift slightly) — the numerics guardrail for the production dtype."""
    from deepemia_tpu.models.mask_rcnn import build_model, init_params, predict

    img = jnp.asarray((rng.random((128, 128, 3)) * 255).astype(np.float32))
    m32 = build_model("R50", num_classes=2, use_bf16=False)
    p32 = init_params(m32, (128, 128), seed=2)
    m16 = build_model("R50", num_classes=2, use_bf16=True)
    det32 = predict(m32, p32, img, score_threshold=0.3)
    det16 = predict(m16, p32, img, score_threshold=0.3)
    n32 = int(det32.valid.sum())
    n16 = int(det16.valid.sum())
    # random weights put many scores near the threshold, so borderline
    # detections may flip; require agreement of the confident head of the
    # ranking, not the tail
    assert abs(n32 - n16) <= 3
    k = min(n32, n16, 5)
    if k:
        np.testing.assert_allclose(
            np.asarray(det32.scores)[:k], np.asarray(det16.scores)[:k],
            atol=0.06,
        )


@pytest.mark.compiles
def test_full_pass_guard(rng):
    """Images over full_pass_max_dim skip the whole-image forward but the
    tile grid still produces detections; small images keep the full pass."""
    from deepemia_tpu.inference.engine import ClassSettings, TileEngine
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    model = build_model("R50", num_classes=2, use_bf16=False)
    params = init_params(model, (64, 64), seed=4)
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    img = (rng.random((200, 200, 3)) * 255).astype(np.uint8)
    guarded = TileEngine(
        model, params, tile_size=128, upscale_factor=1.0, capacity=64,
        full_pass_max_dim=100,  # force skip
    )
    normal = TileEngine(
        model, params, tile_size=128, upscale_factor=1.0, capacity=64,
    )
    tiles_only = TileEngine(
        model, params, tile_size=128, upscale_factor=1.0, capacity=64,
        full_pass_max_dim=0,  # tiles-only mode: no whole-image pass at all
    )
    ig, _ = guarded.infer(img, settings)
    im_, _ = normal.infer(img, settings)
    it, _ = tiles_only.infer(img, settings)
    # both modes produce a valid padded set; guarded must not crash or
    # return the dummy-empty path since tiling covers the image
    assert ig.boxes.shape == im_.boxes.shape == it.boxes.shape
    assert int(ig.valid.sum()) >= 0 and int(im_.valid.sum()) >= 0
    # tiles-only on an image SMALLER than one tile falls back to the
    # native full pass (the only detection source) instead of going dark
    small = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    is_, _ = tiles_only.infer(small, settings)
    assert is_.boxes.shape[0] == 64


def test_windowed_host_measurements_match_fullres():
    """The O(K*S^2) window export must reproduce the full-res host rows:
    exactly for instances that fit the window natively, within ~2% for an
    instance larger than the window (shrink-to-fit rescaling)."""
    import types

    import jax.numpy as jnp

    from deepemia_tpu.inference.detections import empty_instances
    from deepemia_tpu.inference.measure_host import (
        measurement_rows_host,
        measurement_rows_host_windows,
    )
    from deepemia_tpu.inference.pipeline import InferencePipeline
    from deepemia_tpu.ops.masks import paste_masks

    h = w = 400
    inst = empty_instances(4)
    # instance 0: 80x60 ellipse-ish blob (fits the 192 window natively)
    p0 = np.zeros((28, 28), np.float32)
    yy, xx = np.mgrid[:28, :28]
    p0[((yy - 14) / 13.0) ** 2 + ((xx - 14) / 10.0) ** 2 <= 1.0] = 1.0
    # instance 1: 300x280 blob (larger than the window -> scaled path)
    inst = inst._replace(
        mask_probs=inst.mask_probs.at[0].set(jnp.asarray(p0)).at[1].set(
            jnp.asarray(p0)
        ),
        boxes=inst.boxes.at[0].set(jnp.asarray([50.0, 60.0, 130.0, 120.0]))
        .at[1].set(jnp.asarray([40.0, 50.0, 340.0, 330.0])),
        valid=inst.valid.at[:2].set(True),
    )
    classes = np.zeros(4, np.int32)
    valid = np.array([True, True, False, False])

    full = np.asarray(
        paste_masks(inst.mask_probs, inst.boxes, h, w, 0.5)
    ) & valid[:, None, None]
    rows_full = measurement_rows_host(
        full, classes, valid, "img", ["a"], 1.0, "0", float(h * w)
    )

    fake = types.SimpleNamespace(mask_threshold=0.5)
    wins, origins, scales = InferencePipeline._mask_windows(fake, inst)
    assert scales[0] == pytest.approx(1.0)
    assert scales[1] < 1.0
    rows_win = measurement_rows_host_windows(
        wins, origins, scales, classes, valid, "img", ["a"], 1.0, "0",
        float(h * w),
    )
    assert len(rows_full) == len(rows_win) == 2
    for rf, rw in zip(rows_full, rows_win):
        for col in (3, 4, 6, 7, 8, 11):  # axes, rect dims, diameter, perim
            assert rw[col] == pytest.approx(rf[col], rel=0.03), (
                f"col {col}: {rw[col]} vs {rf[col]}"
            )
