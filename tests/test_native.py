"""Native C++ measurement kernels vs cv2 oracle (exact-parity tests)."""

import cv2
import numpy as np
import pytest

from deepemia_tpu import native
from deepemia_tpu.inference.measure_host import measure_mask_host


def _shapes():
    disk = np.zeros((100, 100), np.uint8)
    cv2.circle(disk, (50, 50), 30, 1, -1)
    ell = np.zeros((128, 128), np.uint8)
    cv2.ellipse(ell, (64, 64), (40, 22), 25, 0, 360, 1, -1)
    blob = np.zeros((80, 80), np.uint8)
    cv2.circle(blob, (30, 40), 15, 1, -1)
    cv2.circle(blob, (48, 40), 15, 1, -1)  # merged pair (single component)
    return {"disk": disk, "ellipse": ell, "blob": blob}


def _cv2_contour(mask):
    cnts, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    return max(cnts, key=cv2.contourArea)


@pytest.mark.parametrize("name", ["disk", "ellipse", "blob"])
def test_area_perimeter_exact_vs_cv2(name):
    mask = _shapes()[name]
    c = _cv2_contour(mask)
    pts = native.trace_outer_contour(mask)
    area, perim = native.polygon_area_perimeter(pts)
    assert area == pytest.approx(cv2.contourArea(c), abs=0.51)
    assert perim == pytest.approx(cv2.arcLength(c, True), rel=0.002)


@pytest.mark.parametrize("name", ["disk", "ellipse", "blob"])
def test_min_area_rect_vs_cv2(name):
    mask = _shapes()[name]
    c = _cv2_contour(mask)
    (_, _), (rw, rh), _ = cv2.minAreaRect(c)
    got = sorted(native.min_area_rect(native.trace_outer_contour(mask)))
    assert got[0] == pytest.approx(min(rw, rh), abs=0.6)
    assert got[1] == pytest.approx(max(rw, rh), abs=0.6)


def test_fit_ellipse_vs_cv2():
    mask = _shapes()["ellipse"]
    c = _cv2_contour(mask)
    (_, _), (ea, eb), _ = cv2.fitEllipse(c)
    got = native.fit_ellipse(native.trace_outer_contour(mask))
    assert got is not None
    major, minor, ecc = got
    assert major == pytest.approx(max(ea, eb), rel=0.01)
    assert minor == pytest.approx(min(ea, eb), rel=0.01)
    assert 0.7 < ecc < 0.95


def test_degenerate_inputs():
    empty = np.zeros((10, 10), np.uint8)
    assert len(native.trace_outer_contour(empty)) == 0
    single = np.zeros((10, 10), np.uint8)
    single[5, 5] = 1
    pts = native.trace_outer_contour(single)
    assert len(pts) >= 1
    assert native.fit_ellipse(pts) is None  # < 5 points
    a, p = native.polygon_area_perimeter(pts)
    assert a == 0.0


def test_fallback_matches_native():
    """numpy fallbacks agree with the C++ kernels."""
    mask = _shapes()["ellipse"]
    pts = native.trace_outer_contour(mask)
    fb_pts = native._trace_fallback(mask, 16384)
    np.testing.assert_array_equal(pts, fb_pts)
    assert native._min_area_rect_fallback(pts) == pytest.approx(
        native.min_area_rect(pts), abs=0.5
    )
    fb_ell = native._fit_ellipse_fallback(pts)
    nat_ell = native.fit_ellipse(pts)
    assert fb_ell is not None and nat_ell is not None
    assert fb_ell[0] == pytest.approx(nat_ell[0], rel=0.02)
    assert fb_ell[1] == pytest.approx(nat_ell[1], rel=0.02)


def test_measure_mask_host_multicomponent():
    mask = np.zeros((60, 60), bool)
    mask[5:15, 5:15] = True
    mask[30:50, 30:50] = True
    out = measure_mask_host(mask)
    assert len(out) == 2
    areas = sorted(m["area"] for m in out)
    # polygon areas of 10x10 and 20x20 squares (through-center contours)
    assert areas[0] == pytest.approx(81.0, abs=1.0)
    assert areas[1] == pytest.approx(361.0, abs=1.0)
