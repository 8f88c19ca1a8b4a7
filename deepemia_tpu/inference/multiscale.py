"""Multi-scale + iterative inference modes and size heuristics.

Parity surfaces (all re-architected TPU-first):

  * ``run_adaptive_multiscale_inference`` (reference inference.py:1833-2067,
    config multiscale_settings config.yaml:98-101): run the model on the
    image resized to each scale of a static ladder, map boxes back, merge
    with mask-IoU dedup. Each scale is one compiled program; results stay on
    device until the final merge. (In the reference this path was dead code —
    Q7; here it is a working mode.)

  * ``run_iterative_class_inference`` (reference inference.py:2069-2296,
    iterative_stopping config.yaml:69-73): the reference re-ran the GPU
    predictor once per iteration with a lowered threshold baked into the cfg.
    Thresholds here are data, so iteration collapses to ONE forward pass at
    the floor threshold plus a host-side walk down a threshold ladder with
    the reference's stopping criteria (min_total_masks, min_relative_increase,
    max_consecutive_zero, min_iterations) — identical semantics, no repeated
    forwards.

  * size heuristics (``calculate_average_mask_sizes`` :1626-1707 /
    ``determine_small_classes`` :1709-1736): average confident-mask pixel
    size per class over <=5 sample images; classes at or below the 50th
    percentile are "small".
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Sequence, Set, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.inference.detections import (
    InstanceSet,
    concat_instances,
    dedup_by_mask_iou,
    filter_instances,
)
from deepemia_tpu.inference.engine import ClassSettings, TileEngine

log = logging.getLogger("deepemia_tpu.multiscale")

BASELINE_SCALES = (0.7, 1.0, 1.5, 2.0)


@functools.partial(jax.jit, static_argnums=(1,))
def _resize_cached(image, shape):
    # antialias=False: plain bilinear taps, matching the host path's
    # cv2.resize(INTER_LINEAR) (both use half-pixel centers) — the default
    # antialias=True widens the filter on downscales, so the same image
    # would yield different pixels (hence detections) depending only on
    # whether the caller passed a numpy or a jax array
    return jax.image.resize(
        image.astype(jnp.float32), shape, "linear", antialias=False
    )


def _device_resize(image, nh: int, nw: int):
    """On-device bilinear resize (compile-cached per target geometry)."""
    return _resize_cached(image, (nh, nw, int(image.shape[-1])))
AGGRESSIVE_SCALES = (1.0, 1.5, 2.0, 2.5, 3.0)


def run_multiscale_inference(
    engine: TileEngine,
    image: np.ndarray,
    settings: ClassSettings,
    scales: Sequence[float] = BASELINE_SCALES,
    dedup_iou: float = 0.4,
    max_scale: float = 3.0,
    upscale=None,
) -> Tuple[InstanceSet, Any]:
    """Run the (non-tiled) forward at every scale and merge.

    Scaled geometries are rounded to /64 so every scale compiles against an
    FPN-legal static shape; box coordinates are mapped back exactly by the
    actual resize ratio.

    A numpy image resizes on the host (cv2); a jax Array resizes ON DEVICE
    (jax.image.resize) so the image transfers to the device ONCE instead of
    once per scale — at 4 scales of a 1024² image that is 48 MB of
    host->device traffic saved per image.
    """
    import cv2

    on_device = isinstance(image, jax.Array)
    h, w = image.shape[:2]
    parts: List[InstanceSet] = []
    quality = 0.0
    for s in scales:
        s = min(float(s), max_scale)
        nh = max(64, int(round(h * s / 64)) * 64)
        nw = max(64, int(round(w * s / 64)) * 64)
        if on_device:
            resized = _device_resize(image, nh, nw)
        else:
            resized = cv2.resize(
                image, (nw, nh), interpolation=cv2.INTER_LINEAR
            )
        inst, quality = engine.infer(resized, settings, upscale=upscale)
        # map boxes back to original coordinates
        sx, sy = w / nw, h / nh
        boxes = inst.boxes * jnp.asarray([sx, sy, sx, sy], jnp.float32)
        parts.append(inst._replace(boxes=boxes))
    merged = concat_instances(parts, parts[0].capacity)
    merged = dedup_by_mask_iou(merged, (h, w), dedup_iou, class_aware=True)
    return merged, quality


def iterative_threshold_inference(
    inst_at_floor: InstanceSet,
    base_threshold,
    floor_threshold: float = 0.2,
    num_steps: int = 5,
    min_total_masks: int = 10,
    min_relative_increase: float = 0.25,
    max_consecutive_zero: int = 1,
    min_iterations: int = 2,
) -> Tuple[InstanceSet, Dict]:
    """Walk a descending threshold ladder over one forward pass's outputs,
    PER CLASS (the reference runs its iterative loop per class, so each
    class's base threshold and stopping walk are independent).

    ``inst_at_floor`` holds all detections above ``floor_threshold``;
    ``base_threshold`` is a scalar or per-class [C] array. Returns the
    instances above each class's final threshold plus a diagnostic dict.
    """
    # ONE device->host pull for the three columns the host walk reads: on
    # tunneled devices each pull is a full round trip, so three separate
    # np.asarray calls triple the latency of this stage.
    packed = np.asarray(
        jnp.stack(
            [
                inst_at_floor.scores.astype(jnp.float32),
                inst_at_floor.valid.astype(jnp.float32),
                inst_at_floor.classes.astype(jnp.float32),
            ]
        )
    )
    scores = packed[0]
    valid = packed[1] != 0.0
    classes = packed[2].astype(np.int32)
    bases = np.atleast_1d(np.asarray(base_threshold, np.float64))
    present = sorted(set(classes[valid].tolist())) or [0]
    final_thr: Dict[int, float] = {}
    history = []
    for c in present:
        base_c = float(bases[c]) if c < len(bases) else float(bases[-1])
        # the ladder must DESCEND from the class base; a base already at or
        # below the floor means 'keep everything the engine admitted'
        floor_c = min(floor_threshold, base_c)
        ladder = np.linspace(base_c, floor_c, num_steps)
        cls_mask = (classes == c) & valid
        count_prev = 0
        consecutive_zero = 0
        thr_c = float(ladder[0])
        for it, thr in enumerate(ladder):
            count = int((scores[cls_mask] >= thr).sum())
            gained = count - count_prev
            history.append(
                {"class": int(c), "iteration": it, "threshold": float(thr),
                 "count": count}
            )
            thr_c = float(thr)
            if it + 1 >= min_iterations:
                if count >= min_total_masks:
                    rel = gained / max(count_prev, 1)
                    if rel < min_relative_increase:
                        break
                if gained == 0:
                    consecutive_zero += 1
                    if consecutive_zero > max_consecutive_zero:
                        break
                else:
                    consecutive_zero = 0
            count_prev = count
        final_thr[int(c)] = thr_c
    thr_vec = np.array(
        [final_thr.get(int(c), float(bases[-1])) for c in classes], np.float32
    )
    keep = jnp.asarray((scores >= thr_vec) & valid)
    return (
        filter_instances(inst_at_floor, keep),
        {"final_threshold": final_thr, "history": history},
    )


def calculate_average_mask_sizes(
    engine: TileEngine,
    image_paths: Sequence[str],
    settings: ClassSettings,
    confidence: float = 0.7,
    sample_size: int = 5,
) -> Dict[int, float]:
    """Average confident-instance pixel area per class over a small sample
    (reference inference.py:1626-1707). Uses RoI mask fraction x box area —
    no full-res paste needed for a heuristic."""
    import cv2

    sizes: Dict[int, List[float]] = {}
    for path in list(image_paths)[:sample_size]:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            continue
        inst, _ = engine.infer(img, settings)
        # Compute areas on device and make ONE packed pull: a separate
        # np.asarray per column (incl. the multi-MB mask_probs tensor) costs
        # a full round trip each on tunneled devices.
        frac_dev = inst.mask_probs.mean(axis=(1, 2))
        areas_dev = (
            frac_dev
            * jnp.maximum(inst.boxes[:, 2] - inst.boxes[:, 0], 0.0)
            * jnp.maximum(inst.boxes[:, 3] - inst.boxes[:, 1], 0.0)
        )
        packed = np.asarray(
            jnp.stack(
                [
                    inst.scores.astype(jnp.float32),
                    inst.valid.astype(jnp.float32),
                    inst.classes.astype(jnp.float32),
                    areas_dev.astype(jnp.float32),
                ]
            )
        )
        valid = (packed[1] != 0.0) & (packed[0] >= confidence)
        classes = packed[2].astype(np.int32)
        areas = packed[3]
        for c, a in zip(classes[valid], areas[valid]):
            sizes.setdefault(int(c), []).append(float(a))
    return {c: float(np.mean(v)) for c, v in sizes.items() if v}


def classes_needing_upscale(
    class_avg_sizes: Dict[int, float], min_area: float = 1024.0
) -> Set[int]:
    """Classes whose average instance area falls below an ABSOLUTE cutoff
    (default 32^2 px^2 — COCO's small-object bound). Unlike the
    percentile-relative `determine_small_classes` (which by construction
    marks ~half the detected classes small on every dataset), this answers
    the question the tile-upscale decision actually asks: are any objects
    small enough that the detector needs the x2 resolution boost?"""
    return {c for c, s in class_avg_sizes.items() if s < min_area}


def determine_small_classes(
    class_avg_sizes: Dict[int, float], threshold_percentile: float = 50
) -> Set[int]:
    """Classes at or below the percentile threshold are 'small' (reference
    inference.py:1709-1736)."""
    if not class_avg_sizes:
        return set()
    threshold = np.percentile(list(class_avg_sizes.values()), threshold_percentile)
    return {c for c, s in class_avg_sizes.items() if s <= threshold}
