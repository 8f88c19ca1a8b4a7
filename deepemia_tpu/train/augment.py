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


def augment_sample(
    image: np.ndarray,
    masks: np.ndarray,
    rng: np.random.Generator,
    rotation_deg: float = 20.0,
    brightness_range: Tuple[float, float] = (0.8, 1.2),
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply the reference augmentation set to (image [H,W,3], masks [N,H,W])."""
    if rng.random() < 0.5:  # horizontal flip
        image = image[:, ::-1]
        masks = masks[:, :, ::-1]
    if rng.random() < 0.5:  # vertical flip
        image = image[::-1]
        masks = masks[:, ::-1]

    angle = rng.uniform(-rotation_deg, rotation_deg)
    h, w = image.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, 1.0)
    image = cv2.warpAffine(np.ascontiguousarray(image), m, (w, h), flags=cv2.INTER_LINEAR)
    if len(masks):
        rotated = [
            cv2.warpAffine(
                np.ascontiguousarray(mk.astype(np.uint8)), m, (w, h),
                flags=cv2.INTER_NEAREST,
            ).astype(bool)
            for mk in masks
        ]
        masks = np.stack(rotated)

    factor = rng.uniform(*brightness_range)
    image = np.clip(image.astype(np.float32) * factor, 0, 255).astype(np.uint8)
    return image, masks


def boxes_from_masks(masks: np.ndarray) -> np.ndarray:
    """[N,H,W] -> [N,4] XYXY (empty mask -> zeros)."""
    out = np.zeros((len(masks), 4), np.float32)
    for i, mk in enumerate(masks):
        ys, xs = np.nonzero(mk)
        if ys.size:
            out[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return out
