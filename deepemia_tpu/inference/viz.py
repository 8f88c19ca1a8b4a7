"""Overlay rendering + color legend (host-side, final PNG artifacts only).

Parity surface: reference overlay rendering at inference.py:1080-1145 (masks
alpha-blended per class color, instance IDs drawn at centroids) and the color
legend at :1303-1314. All device compute is done by the time this runs; this
module only rasterizes numpy results to PNGs.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import cv2
import numpy as np

# class colors, BGR (reference inference.py:972-981)
CLASS_COLORS = [
    (0, 255, 0),
    (255, 0, 0),
    (0, 0, 255),
    (255, 255, 0),
    (255, 0, 255),
    (0, 255, 255),
    (128, 0, 128),
    (255, 165, 0),
]


def render_overlay(
    image: np.ndarray,
    masks: Sequence[np.ndarray],
    classes: Sequence[int],
    scores: Optional[Sequence[float]] = None,
    alpha: float = 0.4,
    draw_ids: bool = True,
) -> np.ndarray:
    """Alpha-blend instance masks over the image with per-class colors and
    instance-ID labels."""
    out = image.copy()
    if out.ndim == 2:
        out = cv2.cvtColor(out, cv2.COLOR_GRAY2BGR)
    color_layer = out.copy()
    for mask, cls in zip(masks, classes):
        color = CLASS_COLORS[int(cls) % len(CLASS_COLORS)]
        color_layer[mask.astype(bool)] = color
    out = cv2.addWeighted(color_layer, alpha, out, 1.0 - alpha, 0)
    if draw_ids:
        for i, mask in enumerate(masks, 1):
            ys, xs = np.nonzero(mask)
            if ys.size == 0:
                continue
            cx, cy = int(xs.mean()), int(ys.mean())
            cv2.putText(
                out,
                str(i),
                (cx, cy),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.5,
                (255, 255, 255),
                1,
                cv2.LINE_AA,
            )
    return out


def draw_scalebar_debug(image: np.ndarray, debug: dict, psum: str) -> None:
    """Draw the scale-bar ROI box + detected line in place (reference
    scalebar_ocr.py debug overlays, enabled by --draw-scalebar)."""
    if debug.get("roi"):
        x0, y0, x1, y1 = debug["roi"]
        cv2.rectangle(image, (x0, y0), (x1, y1), (0, 200, 255), 1)
    if debug.get("line"):
        lx0, ly0, lx1, ly1 = debug["line"]
        cv2.line(image, (lx0, ly0), (lx1, ly1), (0, 0, 255), 2)
        cv2.putText(
            image,
            f"scale: {psum} ({debug.get('text', '')!r})",
            (lx0, max(ly0 - 6, 12)),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.45,
            (0, 0, 255),
            1,
            cv2.LINE_AA,
        )


def render_legend(class_names: List[str], cell_h: int = 30) -> np.ndarray:
    """Color legend image mapping class names to overlay colors (reference
    inference.py:1303-1314)."""
    width = 260
    img = np.full((cell_h * max(len(class_names), 1), width, 3), 255, np.uint8)
    for i, name in enumerate(class_names):
        color = CLASS_COLORS[i % len(CLASS_COLORS)]
        y0 = i * cell_h
        cv2.rectangle(img, (8, y0 + 6), (38, y0 + cell_h - 6), color, -1)
        cv2.putText(
            img,
            f"{i}: {name}",
            (48, y0 + cell_h - 10),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.55,
            (0, 0, 0),
            1,
            cv2.LINE_AA,
        )
    return img


def save_png(path: Path, image: np.ndarray) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), image)
