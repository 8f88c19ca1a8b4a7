"""Dedup parity: our on-device mask-IoU dedup vs a faithful port of the
reference's deduplicate_masks_smart greedy loop (inference.py:2552-2677,
with its Q3 bbox-layout bug fixed in the oracle so both compute true mask
IoU in score order)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepemia_tpu.inference.detections import dedup_by_mask_iou, empty_instances
from deepemia_tpu.ops.masks import paste_masks


def _oracle_dedup(masks, scores, classes, iou_threshold):
    """Reference-semantics greedy dedup (score order, same-class, strict >)."""
    order = np.argsort(-np.asarray(scores), kind="stable")
    removed = set()
    keep = []
    for i in order:
        if i in removed:
            continue
        keep.append(i)
        for j in order:
            if j == i or j in removed or classes[j] != classes[i]:
                continue
            inter = np.count_nonzero(masks[i] & masks[j])
            union = np.count_nonzero(masks[i] | masks[j])
            if union and inter / union > iou_threshold:
                removed.add(j)
    return sorted(keep)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dedup_matches_reference_semantics(seed):
    rng = np.random.default_rng(seed)
    h = w = 96
    n = 24
    cap = 32
    inst = empty_instances(cap)
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        cx, cy = rng.uniform(20, 76, 2)
        r = rng.uniform(6, 16)
        boxes[i] = [cx - r, cy - r, cx + r, cy + r]
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    classes = rng.integers(0, 2, n).astype(np.int32)
    inst = inst._replace(
        boxes=inst.boxes.at[:n].set(jnp.asarray(boxes)),
        scores=inst.scores.at[:n].set(jnp.asarray(scores)),
        classes=inst.classes.at[:n].set(jnp.asarray(classes)),
        valid=inst.valid.at[:n].set(True),
        mask_probs=inst.mask_probs.at[:n].set(1.0),  # full-box masks
    )
    # stride=1 so device IoU is exact for the comparison
    out = dedup_by_mask_iou(inst, (h, w), 0.4, stride=1, class_aware=True)
    got = sorted(np.flatnonzero(np.asarray(out.valid)[:n]).tolist())

    masks = np.asarray(paste_masks(inst.mask_probs[:n], inst.boxes[:n], h, w))
    expect = _oracle_dedup(masks, scores, classes, 0.4)
    assert got == expect
