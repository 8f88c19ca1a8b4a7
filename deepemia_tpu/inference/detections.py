"""Padded detection containers + merging utilities.

The currency of the inference stack: every stage consumes and produces
``InstanceSet`` — fixed-capacity arrays with a validity mask — so arbitrary
chains of tile merging, dedup, ensembling and constraint filtering compile
into one XLA program (the reference's per-stage Python lists are the
anti-pattern this replaces; SURVEY.md §3.1 hot loops b/c).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from deepemia_tpu.ops import boxes as box_ops
from deepemia_tpu.ops import masks as mask_ops


class InstanceSet(NamedTuple):
    """Fixed-capacity instance collection for one image.

    boxes [K,4] global XYXY; scores [K]; classes [K] int32; valid [K] bool;
    mask_probs [K,R,R] RoI-frame mask probabilities (paste with boxes).
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    mask_probs: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.boxes.shape[0]

    def count(self) -> jnp.ndarray:
        return self.valid.sum()


def empty_instances(capacity: int, mask_res: int = 28) -> InstanceSet:
    return InstanceSet(
        boxes=jnp.zeros((capacity, 4), jnp.float32),
        scores=jnp.zeros((capacity,), jnp.float32),
        classes=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        mask_probs=jnp.zeros((capacity, mask_res, mask_res), jnp.float32),
    )


def concat_instances(sets: Sequence[InstanceSet], capacity: int) -> InstanceSet:
    """Concatenate padded sets and keep the top-``capacity`` by score."""
    boxes = jnp.concatenate([s.boxes for s in sets])
    scores = jnp.concatenate([s.scores for s in sets])
    classes = jnp.concatenate([s.classes for s in sets])
    valid = jnp.concatenate([s.valid for s in sets])
    masks = jnp.concatenate([s.mask_probs for s in sets])
    keyed = jnp.where(valid, scores, -jnp.inf)
    top, idx = jax.lax.top_k(keyed, min(capacity, keyed.shape[0]))
    out = InstanceSet(
        boxes=boxes[idx],
        scores=jnp.where(jnp.isfinite(top), top, 0.0),
        classes=classes[idx],
        valid=jnp.isfinite(top),
        mask_probs=masks[idx],
    )
    if out.capacity < capacity:
        pad = capacity - out.capacity
        out = InstanceSet(
            boxes=jnp.pad(out.boxes, ((0, pad), (0, 0))),
            scores=jnp.pad(out.scores, (0, pad)),
            classes=jnp.pad(out.classes, (0, pad)),
            valid=jnp.pad(out.valid, (0, pad)),
            mask_probs=jnp.pad(out.mask_probs, ((0, pad), (0, 0), (0, 0))),
        )
    return out


def filter_instances(inst: InstanceSet, keep: jnp.ndarray) -> InstanceSet:
    """Invalidate rows where ``keep`` is False (no compaction — stays padded)."""
    return inst._replace(valid=inst.valid & keep)


def compact_instances(inst: InstanceSet) -> InstanceSet:
    """Move valid rows to the front (score-descending), invalid to the back.

    Downstream stages can then slice a small prefix bucket instead of paying
    for the full padded capacity (the measurement/export stages use this with
    power-of-2 buckets to keep compile-cache churn bounded)."""
    key = jnp.where(inst.valid, inst.scores, -jnp.inf)
    order = jnp.argsort(-key)
    return InstanceSet(
        boxes=inst.boxes[order],
        scores=inst.scores[order],
        classes=inst.classes[order],
        valid=inst.valid[order],
        mask_probs=inst.mask_probs[order],
    )


def slice_instances(inst: InstanceSet, k: int) -> InstanceSet:
    """First-k prefix of a (compacted) InstanceSet."""
    return InstanceSet(
        boxes=inst.boxes[:k],
        scores=inst.scores[:k],
        classes=inst.classes[:k],
        valid=inst.valid[:k],
        mask_probs=inst.mask_probs[:k],
    )


def bucket_size(count: int, cap: int, minimum: int = 8) -> int:
    """Next power-of-2 >= count, clamped to [minimum, cap]."""
    b = minimum
    while b < count and b < cap:
        b *= 2
    return min(b, cap)


def lowres_masks(
    inst: InstanceSet, image_hw, stride: int, threshold: float = 0.5
) -> jnp.ndarray:
    """Paste all instance masks onto a stride-downsampled global grid:
    [K, H/stride, W/stride] bool. The cheap global representation used for
    mask-level dedup/containment (full-res pastes never materialize for the
    whole set at once)."""
    h, w = image_hw
    gh, gw = -(-h // stride), -(-w // stride)
    pasted = mask_ops.paste_masks(
        inst.mask_probs, inst.boxes / float(stride), gh, gw, threshold
    )
    return pasted & inst.valid[:, None, None]


@partial(
    jax.jit, static_argnums=(1,), static_argnames=("stride", "class_aware")
)
def dedup_by_mask_iou(
    inst: InstanceSet,
    image_hw,
    iou_threshold: float,
    stride: int = 8,
    class_aware: bool = True,
) -> InstanceSet:
    """Greedy score-ordered dedup on *mask* IoU (reference
    deduplicate_masks_smart, inference.py:2552-2677 — with its bbox-layout
    bug Q3 fixed by construction). One low-res paste + one MXU matmul + one
    greedy scan. Jitted: called eagerly this is ~40 op dispatches of glue,
    which serializes badly on remote-device transports; as one program it is
    a single dispatch (``image_hw`` must be a hashable (h, w) tuple)."""
    lm = lowres_masks(inst, image_hw, stride)
    iou = mask_ops.mask_iou_matrix(lm, lm)
    if class_aware:
        same = inst.classes[:, None] == inst.classes[None, :]
        iou = jnp.where(same, iou, 0.0)
    keep = box_ops.nms_mask(
        inst.boxes, inst.scores, iou_threshold, valid=inst.valid, iou=iou
    )
    return filter_instances(inst, keep)


def artifact_filter(
    inst: InstanceSet,
    image_hw,
    max_aspect_ratio: float | None = None,
    min_area: float = 0.0,
) -> InstanceSet:
    """Pre-dedup artifact rejection (reference inference.py:2570-2620):
    extreme bbox aspect ratios and sub-minimum areas. (The reference also
    gates on contour compactness < 0.15; the analog here — perimeter²/area on
    the RoI grid — is applied in the measurement stage where perimeter is
    already computed.)"""
    w = jnp.maximum(inst.boxes[:, 2] - inst.boxes[:, 0], 0.0)
    h = jnp.maximum(inst.boxes[:, 3] - inst.boxes[:, 1], 0.0)
    aspect = jnp.maximum(w, h) / jnp.maximum(jnp.minimum(w, h), 1e-6)
    keep = jnp.ones_like(inst.valid)
    if max_aspect_ratio is not None:
        keep &= aspect <= max_aspect_ratio
    if min_area > 0:
        # approximate pixel area from RoI mask fraction × box area
        frac = inst.mask_probs.mean(axis=(1, 2))
        keep &= (frac * w * h) >= min_area
    return filter_instances(inst, keep)
