"""Host exact measurement path: native contour kernels + reference formulas.

The bit-parity alternative to the on-device measurement stack
(inference/measure.py): uses the C++ contour/caliper/ellipse kernels
(native/measure.cpp — cv2-identical algorithms, verified in tests) and the
exact formula set of reference ``measurements.py:114-233`` / the contour loop
of ``inference.py:1148-1253`` (per-contour adaptive area gate, the Q8 unit
quirks, contrast CDF percentiles).

Select with ``performance.measurement_backend: host`` in the config; the
device path remains the throughput default.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np
import scipy.ndimage as ndi

from deepemia_tpu import native
from deepemia_tpu.inference.measure import CSV_HEADER  # noqa: F401 (re-export)

log = logging.getLogger("deepemia_tpu.measure_host")


def measure_mask_host(
    mask: np.ndarray,
    gray: Optional[np.ndarray] = None,
    measure_contrast: bool = False,
) -> List[Dict[str, float]]:
    """Measurements for every external contour of one binary mask.

    Returns a list (one dict per connected component) of raw pixel-space
    quantities: area, perimeter, rect dims, ellipse axes/eccentricity,
    contrast percentiles.
    """
    out: List[Dict[str, float]] = []
    labels, n = ndi.label(mask, structure=np.ones((3, 3)))
    for comp in range(1, n + 1):
        m = labels == comp
        pts = native.trace_outer_contour(m)
        if len(pts) < 2:
            continue
        area, perim = native.polygon_area_perimeter(pts)
        rect_w, rect_h = native.min_area_rect(pts)
        ell = native.fit_ellipse(pts)
        major, minor, ecc = ell if ell else (0.0, 0.0, 0.0)
        d10 = d50 = d90 = None
        if measure_contrast and gray is not None:
            vals = gray[m]
            if vals.size:
                hist, edges = np.histogram(
                    vals, bins=256, range=(0, 255), density=True
                )
                cdf = np.cumsum(hist)
                cdf /= max(cdf[-1], 1e-9)
                d10 = float(np.interp(0.10, cdf, edges[:-1]))
                d50 = float(np.interp(0.50, cdf, edges[:-1]))
                d90 = float(np.interp(0.90, cdf, edges[:-1]))
        out.append(
            {
                "area": area,
                "perimeter": perim,
                "rect_w": rect_w,
                "rect_h": rect_h,
                "major_axis": major,
                "minor_axis": minor,
                "eccentricity": ecc,
                "contrast_d10": d10,
                "contrast_d50": d50,
                "contrast_d90": d90,
            }
        )
    return out


def measurement_rows_host(
    masks: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray,
    image_name: str,
    class_names: List[str],
    um_pix: float,
    psum: str,
    image_area: float,
    gray: Optional[np.ndarray] = None,
    measure_contrast: bool = False,
) -> List[List]:
    """CSV rows (reference schema + Q8 formulas) from full-res host masks.

    Mirrors the reference contour loop exactly: per-contour adaptive gate
    min_area = max(5, image_area·5e-6·0.05) (inference.py:1177-1186); one row
    per surviving contour, instance numbering over masks.
    """
    rows: List[List] = []
    min_area = max(5.0, image_area * 0.000005 * 0.05)
    instance_id = 0
    for i in range(len(masks)):
        if not valid[i]:
            continue
        instance_id += 1
        for meas in measure_mask_host(masks[i], gray, measure_contrast):
            if meas["area"] < min_area:
                continue
            dim_a, dim_b = meas["rect_w"], meas["rect_h"]
            aspect = (
                max(dim_a, dim_b) / min(dim_a, dim_b)
                if min(dim_a, dim_b) > 0
                else 0.0
            )
            a, p = meas["area"], meas["perimeter"]
            cls = int(classes[i])
            cname = (
                class_names[cls] if cls < len(class_names) else f"class_{cls}"
            )
            rows.append(
                [
                    f"{image_name}_{instance_id}",
                    cls,
                    cname,
                    meas["major_axis"] * um_pix,
                    meas["minor_axis"] * um_pix,
                    meas["eccentricity"],
                    min(dim_a, dim_b) * um_pix,
                    max(dim_a, dim_b) * um_pix,
                    float(np.sqrt(4.0 * a / np.pi)) * um_pix,
                    aspect,
                    (4.0 * np.pi * a / (p * p)) * um_pix if p > 0 else 0.0,
                    p * um_pix,
                    max(dim_a, dim_b) * um_pix,
                    1.0 / aspect if aspect > 0 else 0.0,
                    (2.0 * np.sqrt(np.pi * a) / p) * um_pix if p > 0 else 0.0,
                    meas["contrast_d10"],
                    meas["contrast_d50"],
                    meas["contrast_d90"],
                    psum,
                    image_name,
                ]
            )
    return rows
