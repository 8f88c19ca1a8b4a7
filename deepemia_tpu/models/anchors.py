"""Anchor generation for FPN levels.

Matches the zoo Mask R-CNN anchor scheme the reference's predictor uses:
one size per level p2..p6 (32, 64, 128, 256, 512), aspect ratios
(0.5, 1.0, 2.0), anchors centered on feature-grid cells at the level stride.
All shapes are static functions of the (static) input image size.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

LEVELS: Tuple[str, ...] = ("p2", "p3", "p4", "p5", "p6")
STRIDES: Dict[str, int] = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
SIZES: Dict[str, float] = {"p2": 32, "p3": 64, "p4": 128, "p5": 256, "p6": 512}
ASPECT_RATIOS: Tuple[float, ...] = (0.5, 1.0, 2.0)
NUM_ANCHORS_PER_CELL = len(ASPECT_RATIOS)


def cell_anchors(size: float, ratios: Sequence[float] = ASPECT_RATIOS) -> np.ndarray:
    """[A,4] XYXY anchors centered at (0,0) for one level (Detectron2
    convention: area = size², w = size·sqrt(1/ratio), h = size·sqrt(ratio))."""
    out = []
    area = size * size
    for r in ratios:
        w = float(np.sqrt(area / r))
        h = w * r
        out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.array(out, dtype=np.float32)


def level_anchors(level: str, feat_h: int, feat_w: int) -> jnp.ndarray:
    """[H·W·A, 4] anchors for one FPN level of spatial size (feat_h, feat_w)."""
    stride = STRIDES[level]
    base = cell_anchors(SIZES[level])  # [A,4]
    shift_x = (np.arange(feat_w, dtype=np.float32)) * stride
    shift_y = (np.arange(feat_h, dtype=np.float32)) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # [HW,1,4]
    anchors = (shifts + base[None]).reshape(-1, 4)
    return jnp.asarray(anchors)


def all_anchors(feat_shapes: Dict[str, Tuple[int, int]]) -> Dict[str, jnp.ndarray]:
    """Per-level anchors for a dict of {level: (H, W)} feature shapes."""
    return {lv: level_anchors(lv, h, w) for lv, (h, w) in feat_shapes.items()}
