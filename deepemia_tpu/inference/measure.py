"""Measurement phase: per-instance morphometrics -> reference CSV schema.

Parity surface: the measurements loop of reference inference.py:1019-1291 and
the formulas of measurements.py:114-233 (including the Q8 quirks, replicated
deliberately for CSV parity: Length = *min* rect dimension, Width = *max*;
Circularity and Sphericity multiplied by um_pix; Chords = perimeter·um_pix).

The compute is the on-device morphometrics stack (ops/morphometrics.py): each
instance's full-resolution mask is pasted transiently inside a lax.map body,
reduced to 13 scalars, and only the scalar table leaves the device — versus
the reference's per-mask cv2.findContours + python loop.
"""

from __future__ import annotations

import logging
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.inference.detections import InstanceSet
from deepemia_tpu.ops import masks as mask_ops
from deepemia_tpu.ops import morphometrics as mm
from deepemia_tpu.ops.image import to_grayscale

log = logging.getLogger("deepemia_tpu.measure")

CSV_HEADER = [
    "Instance_ID",
    "Class",
    "Class_Name",
    "Major axis length",
    "Minor axis length",
    "Eccentricity",
    "C. Length",
    "C. Width",
    "Circular eq. diameter",
    "Aspect ratio",
    "Circularity",
    "Chord length",
    "Ferret diameter",
    "Roundness",
    "Sphericity",
    "Contrast d10",
    "Contrast d50",
    "Contrast d90",
    "Detected scale bar",
    "File name",
]


def measure_instances_device(
    inst: InstanceSet,
    image: jnp.ndarray,
    measure_contrast: bool = False,
    mask_threshold: float = 0.5,
):
    """Batch-measure all instances of one image on device.

    Returns a dict of [K] arrays (raw pixel units; unit scaling happens in
    :func:`measurement_rows`). Full-res masks exist only transiently inside
    the scan body.
    """
    h, w = int(image.shape[0]), int(image.shape[1])
    gray = to_grayscale(image) if measure_contrast else None

    def one(args):
        probs, box, valid = args
        mask = mask_ops.paste_masks(probs[None], box[None], h, w, mask_threshold)[0]
        mask = mask & valid
        m = mm.measure_mask(mask, gray)
        return m

    res = jax.lax.map(one, (inst.mask_probs, inst.boxes, inst.valid))
    return res


def measurement_rows(
    measures: Dict[str, np.ndarray],
    inst: InstanceSet,
    image_name: str,
    class_names: List[str],
    um_pix: float,
    psum: str,
    image_area: float,
    min_area_floor: float = 5.0,
    valid: np.ndarray | None = None,
    classes: np.ndarray | None = None,
) -> List[List]:
    """Format device measurements into reference-schema CSV rows.

    Applies the reference's adaptive area gate (inference.py:1177-1186:
    min_area = max(5, image_area·5e-6·0.05)) and the exact Q8 formulas.
    Callers that already pulled ``valid``/``classes`` to the host can pass
    them to avoid two extra device round trips.
    """
    rows: List[List] = []
    min_area = max(min_area_floor, image_area * 0.000005 * 0.05)
    if valid is None:
        valid = np.asarray(inst.valid)
    if classes is None:
        classes = np.asarray(inst.classes)
    get = lambda k: np.asarray(measures[k])  # noqa: E731

    area = get("area")
    perim = get("perimeter")
    rect_w = get("rect_w")
    rect_h = get("rect_h")
    major = get("major_axis")
    minor = get("minor_axis")
    ecc = get("eccentricity")
    d10, d50, d90 = get("contrast_d10"), get("contrast_d50"), get("contrast_d90")

    instance_id = 0
    for i in range(len(valid)):
        if not valid[i]:
            continue
        instance_id += 1
        if area[i] < min_area:
            continue
        dim_a, dim_b = float(rect_w[i]), float(rect_h[i])
        aspect = (
            max(dim_a, dim_b) / min(dim_a, dim_b)
            if min(dim_a, dim_b) > 0
            else 0.0
        )
        p = float(perim[i])
        a = float(area[i])
        cls = int(classes[i])
        cname = (
            class_names[cls] if cls < len(class_names) else f"class_{cls}"
        )
        rows.append(
            [
                f"{image_name}_{instance_id}",
                cls,
                cname,
                float(major[i]) * um_pix,
                float(minor[i]) * um_pix,
                float(ecc[i]),
                min(dim_a, dim_b) * um_pix,  # C. Length (Q8: min)
                max(dim_a, dim_b) * um_pix,  # C. Width (Q8: max)
                float(np.sqrt(4.0 * a / np.pi)) * um_pix,
                aspect,
                (4.0 * np.pi * a / (p * p)) * um_pix if p > 0 else 0.0,
                p * um_pix,  # Chord length (Q8: perimeter)
                max(dim_a, dim_b) * um_pix,  # Feret
                1.0 / aspect if aspect > 0 else 0.0,
                (2.0 * np.sqrt(np.pi * a) / p) * um_pix if p > 0 else 0.0,
                float(d10[i]) if d10 is not None else None,
                float(d50[i]) if d50 is not None else None,
                float(d90[i]) if d90 is not None else None,
                psum,
                image_name,
            ]
        )
    return rows
