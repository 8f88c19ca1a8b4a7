"""Image-level ops: resize, normalization, quality scoring.

Replaces reference usages of ``cv2.resize`` (inference.py:2378-2420 tile
upscaling) with ``jax.image.resize``, and reimplements the adaptive-confidence
quality score (inference.py:256-335) as cheap on-device reductions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import image as jimage

# Detectron2 R50/R101 zoo models are BGR with these pixel stats
# (the weight converter preserves the convention so converted checkpoints
# produce identical activations).
PIXEL_MEAN_BGR = (103.53, 116.28, 123.675)
PIXEL_STD_BGR = (1.0, 1.0, 1.0)


def to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] BGR uint8/float -> [H,W] float32 luma (cv2 BGR2GRAY weights)."""
    img = image.astype(jnp.float32)
    if img.ndim == 2:
        return img
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    return 0.114 * b + 0.587 * g + 0.299 * r


def image_quality_score(image: jnp.ndarray) -> jnp.ndarray:
    """Quality score in [0,1] = 0.4·brightness + 0.6·contrast (reference
    calculate_image_quality_score, inference.py:256-285)."""
    gray = to_grayscale(image)
    brightness = jnp.mean(gray) / 255.0
    contrast = jnp.std(gray) / 128.0
    return jnp.clip(0.4 * brightness + 0.6 * contrast, 0.0, 1.0)


def adaptive_threshold_scale(quality: jnp.ndarray) -> jnp.ndarray:
    """Multiplier for confidence thresholds from image quality (reference
    adaptive_confidence_threshold, inference.py:288-335): <0.3 → 0.7,
    <0.5 → 0.85, else 1.0."""
    return jnp.where(quality < 0.3, 0.7, jnp.where(quality < 0.5, 0.85, 1.0))


def resize_image(
    image: jnp.ndarray, height: int, width: int, method: str = "linear"
) -> jnp.ndarray:
    """Bilinear resize of [H,W,C] (or [N,H,W,C]) to a static target size."""
    if image.ndim == 3:
        shape = (height, width, image.shape[-1])
    else:
        shape = (image.shape[0], height, width, image.shape[-1])
    return jimage.resize(image.astype(jnp.float32), shape, method=method)


def normalize_bgr(image: jnp.ndarray) -> jnp.ndarray:
    """Subtract Detectron2 pixel means (BGR) — the model-input normalization
    the converted weights expect."""
    mean = jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)
    std = jnp.asarray(PIXEL_STD_BGR, jnp.float32)
    return (image.astype(jnp.float32) - mean) / std


def pad_to_multiple(image: jnp.ndarray, multiple: int = 32):
    """Zero-pad [H,W,C] so H and W are multiples of ``multiple`` (FPN needs
    /32-divisible inputs). Returns (padded, (orig_h, orig_w))."""
    h, w = image.shape[0], image.shape[1]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    return jnp.pad(image, ((0, ph), (0, pw), (0, 0))), (h, w)
