"""Train-time augmentation (host-side, numpy/cv2).

Parity surface: reference ``src/data/custom_mapper.py:13-54`` — H-flip p=0.5,
V-flip p=0.5, rotation ±20°, brightness 0.8–1.2 — with the reference's Q5
defect fixed: there the augmented loader was built before the ``augment``
flag landed, so augmentation silently never ran; here it actually applies.

Masks are transformed with the image (nearest-neighbor) and boxes are
recomputed from the transformed masks, which is exact under flips/rotations.
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def sample_augment_affine(
    h: int,
    w: int,
    rng: np.random.Generator,
    rotation_deg: float = 20.0,
    brightness_range: Tuple[float, float] = (0.8, 1.2),
) -> Tuple[np.ndarray, float]:
    """Sample the reference augmentation set as a single 3x3 affine on
    (x, y, 1) pixel coordinates plus a brightness factor.

    Draw order and distributions are the reference mapper's (H-flip p=0.5,
    V-flip p=0.5, rotation +-20 deg, brightness 0.8-1.2), but expressed in
    coordinate space so the loader can compose it with the resize scale and
    apply ONE warp to the image and ONE fillPoly per mask at the final
    resolution — the per-mask full-frame warp+resize chain was ~23 ms/image
    of the measured 54 ms host prep (tools/profile_train_step.py follow-up).
    """
    m = np.eye(3)
    if rng.random() < 0.5:  # horizontal flip: x' = (w-1) - x
        m = np.array([[-1, 0, w - 1], [0, 1, 0], [0, 0, 1]], np.float64) @ m
    if rng.random() < 0.5:  # vertical flip
        m = np.array([[1, 0, 0], [0, -1, h - 1], [0, 0, 1]], np.float64) @ m
    angle = float(rng.uniform(-rotation_deg, rotation_deg))
    rot = np.eye(3)
    rot[:2] = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, 1.0)
    m = rot @ m
    factor = float(rng.uniform(*brightness_range))
    return m, factor


def boxes_from_masks(masks: np.ndarray) -> np.ndarray:
    """[N,H,W] -> [N,4] XYXY (empty mask -> zeros), vectorized: any-reduce
    each axis then argmax from both ends (np.nonzero per mask was ~7 ms for
    6 full-res masks)."""
    masks = np.asarray(masks)
    n, h, w = masks.shape
    out = np.zeros((n, 4), np.float32)
    if not n:
        return out
    rows = masks.any(axis=2)  # [N,H]
    cols = masks.any(axis=1)  # [N,W]
    nonempty = rows.any(axis=1)
    y0 = rows.argmax(axis=1)
    y1 = h - rows[:, ::-1].argmax(axis=1)
    x0 = cols.argmax(axis=1)
    x1 = w - cols[:, ::-1].argmax(axis=1)
    out[:, 0] = np.where(nonempty, x0, 0)
    out[:, 1] = np.where(nonempty, y0, 0)
    out[:, 2] = np.where(nonempty, x1, 0)
    out[:, 3] = np.where(nonempty, y1, 0)
    return out
