"""Tests for tile grid, image ops, and on-device morphometrics (cv2 oracle)."""

import cv2
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from deepemia_tpu.ops import image as I
from deepemia_tpu.ops import morphometrics as MM
from deepemia_tpu.ops import tiles as T


def _reference_tiles(image, tile_size, overlap_ratio):
    """Reference generate_tiles_with_overlap (inference.py:2488-2519) oracle."""
    h, w = image.shape[:2]
    stride = int(tile_size * (1 - overlap_ratio))
    tiles = []
    for y in range(0, h, stride):
        for x in range(0, w, stride):
            tile = image[y : min(y + tile_size, h), x : min(x + tile_size, w)]
            if tile.shape[0] < tile_size or tile.shape[1] < tile_size:
                p = np.zeros((tile_size, tile_size, 3), image.dtype)
                p[: tile.shape[0], : tile.shape[1]] = tile
                tile = p
            tiles.append((tile, x, y))
    return tiles


def test_tile_grid_matches_reference(rng):
    img = (rng.random((300, 500, 3)) * 255).astype(np.uint8)
    grid = T.compute_tile_grid(300, 500, 128, 0.2)
    ref = _reference_tiles(img, 128, 0.2)
    assert grid.num_tiles == len(ref)
    got = np.asarray(T.extract_tiles(jnp.asarray(img), grid))
    for i, (rt, rx, ry) in enumerate(ref):
        assert tuple(grid.offsets[i]) == (rx, ry)
        np.testing.assert_array_equal(got[i], rt)


def test_tile_box_mapping_roundtrip():
    offsets = jnp.asarray([[100, 200]], jnp.int32)
    local = jnp.asarray([[[10.0, 20.0, 50.0, 60.0]]])  # [T=1,N=1,4]
    global_boxes = T.tile_boxes_to_global(local, offsets, scale=2.0)
    np.testing.assert_allclose(
        np.asarray(global_boxes)[0, 0], [105, 210, 125, 230]
    )
    back = T.global_boxes_to_tile(global_boxes[0], (100, 200), scale=2.0)
    np.testing.assert_allclose(np.asarray(back)[0], np.asarray(local)[0, 0])


def test_quality_score_matches_reference(rng):
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    expect = np.clip(
        0.4 * gray.mean() / 255.0 + 0.6 * gray.std() / 128.0, 0, 1
    )
    got = float(I.image_quality_score(jnp.asarray(img)))
    assert got == pytest.approx(expect, abs=0.02)  # luma rounding diff


def test_adaptive_threshold_scale():
    assert float(I.adaptive_threshold_scale(jnp.float32(0.2))) == pytest.approx(0.7)
    assert float(I.adaptive_threshold_scale(jnp.float32(0.4))) == pytest.approx(0.85)
    assert float(I.adaptive_threshold_scale(jnp.float32(0.8))) == pytest.approx(1.0)


def test_pad_to_multiple():
    img = jnp.zeros((100, 130, 3))
    padded, (h, w) = I.pad_to_multiple(img, 32)
    assert padded.shape == (128, 160, 3) and (h, w) == (100, 130)


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def _cv2_measure(mask):
    cnts, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    c = max(cnts, key=cv2.contourArea)
    area = cv2.contourArea(c)
    perim = cv2.arcLength(c, True)
    (_, _), (rw, rh), _ = cv2.minAreaRect(c)
    ellipse = cv2.fitEllipse(c) if len(c) >= 5 else None
    return area, perim, sorted([rw, rh]), ellipse


@pytest.mark.parametrize(
    "mask",
    [
        _disk(128, 128, 64, 64, 40),
        _disk(128, 128, 50, 70, 25),
        cv2.ellipse(
            np.zeros((128, 128), np.uint8), (64, 64), (45, 20), 30, 0, 360, 1, -1
        ),
    ],
)
def test_morphometrics_vs_cv2(mask):
    area, perim, rect, ellipse = _cv2_measure(mask)
    got = {
        k: float(v)
        for k, v in jax.jit(MM.measure_mask)(jnp.asarray(mask.astype(bool))).items()
    }
    assert got["area"] == pytest.approx(area, rel=0.02)
    assert got["perimeter"] == pytest.approx(perim, rel=0.03)
    got_rect = sorted([got["rect_w"], got["rect_h"]])
    assert got_rect[0] == pytest.approx(rect[0], rel=0.05, abs=2.0)
    assert got_rect[1] == pytest.approx(rect[1], rel=0.05, abs=2.0)
    if ellipse is not None:
        (_, _), (e_minor, e_major), _ = ellipse
        e_major, e_minor = max(e_major, e_minor), min(e_major, e_minor)
        assert got["major_axis"] == pytest.approx(e_major, rel=0.08)
        assert got["minor_axis"] == pytest.approx(e_minor, rel=0.08)


def test_feret_of_rectangle():
    m = np.zeros((64, 64), bool)
    m[20:25, 10:50] = True  # 40x5 rect -> feret = diag = sqrt(39^2+4^2)
    f = float(jax.jit(MM.feret_diameter)(jnp.asarray(m)))
    assert f == pytest.approx(np.hypot(39, 4), rel=0.03)


def test_contrast_percentiles():
    mask = np.zeros((32, 32), bool)
    mask[:16] = True
    gray = np.zeros((32, 32), np.float32)
    gray[:8] = 50.0
    gray[8:16] = 150.0
    d10, d50, d90 = MM.contrast_percentiles(jnp.asarray(mask), jnp.asarray(gray))
    assert float(d10) <= 50.5
    assert 49.0 <= float(d50) <= 151.0
    assert float(d90) >= 149.0
