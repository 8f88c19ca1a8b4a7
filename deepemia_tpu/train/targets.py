"""Training target assignment: anchor/proposal matching + static subsampling.

Replaces the Detectron2 Matcher + subsample_labels machinery that runs inside
the reference's ``DefaultTrainer`` (train_model.py:184-195). Semantics match
Detectron2 defaults:

  * RPN matcher: IoU >= 0.7 positive, <= 0.3 negative, in-between ignored,
    plus low-quality matches (every GT's best anchor becomes positive);
  * RoI matcher: IoU >= 0.5 positive else background (no ignore band);
  * subsampling to fixed counts with a positive fraction.

Dynamic "sample k of n" becomes static top-k over randomized priorities with
validity masks — the TPU-native substitution for torch.randperm-based
sampling (SURVEY.md §7 'Hard parts': dynamic -> static shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepemia_tpu.ops import boxes as box_ops


class MatchResult(NamedTuple):
    gt_index: jnp.ndarray  # [N] best-matching GT row (0 if none)
    labels: jnp.ndarray  # [N] 1 fg / 0 bg / -1 ignore


def match_anchors(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_threshold: float = 0.7,
    neg_threshold: float = 0.3,
    allow_low_quality: bool = True,
) -> MatchResult:
    """Match [N] anchors against padded [G] GT boxes."""
    iou = box_ops.box_iou_matrix(anchors, gt_boxes)  # [N,G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_iou = iou.max(axis=1)
    gt_index = iou.argmax(axis=1)
    labels = jnp.where(
        best_iou >= pos_threshold,
        1,
        jnp.where(best_iou <= neg_threshold, 0, -1),
    )
    if allow_low_quality:
        # every valid GT's best anchor(s) become positive (ties included,
        # Detectron2 set_low_quality_matches_)
        per_gt_best = jnp.where(gt_valid, iou.max(axis=0), -2.0)  # [G]
        is_best = (iou >= per_gt_best[None, :] - 1e-7) & gt_valid[None, :] & (iou > 0)
        labels = jnp.where(is_best.any(axis=1), 1, labels)
    # anchors with no valid GT at all: everything stays negative
    labels = jnp.where(gt_valid.any(), labels, jnp.zeros_like(labels))
    return MatchResult(gt_index=gt_index, labels=labels)


def match_proposals(
    proposals: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_threshold: float = 0.5,
) -> MatchResult:
    """RoI-head matching: fg at IoU >= 0.5, else bg."""
    iou = box_ops.box_iou_matrix(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_iou = iou.max(axis=1)
    return MatchResult(
        gt_index=iou.argmax(axis=1),
        labels=(best_iou >= iou_threshold).astype(jnp.int32),
    )


class SampleResult(NamedTuple):
    idx: jnp.ndarray  # [S] sampled row indices
    is_pos: jnp.ndarray  # [S] bool
    valid: jnp.ndarray  # [S] bool (row participates in the loss)


def subsample(
    labels: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    pos_fraction: float = 0.5,
    extra_valid: jnp.ndarray | None = None,
) -> SampleResult:
    """Sample ``num_samples`` rows with at most ``pos_fraction`` positives
    (Detectron2 subsample_labels). Returns padded static-width indices.

    labels: 1 fg / 0 bg / -1 ignore. Positives fill the first
    ``k_pos = num_samples*pos_fraction`` slots (randomized among positives);
    negatives fill the remainder, trimmed so total stays ``num_samples`` and
    extra negative slots backfill unused positive slots.
    """
    n = labels.shape[0]
    ok = jnp.ones((n,), bool) if extra_valid is None else extra_valid
    r_pos, r_neg = jax.random.split(rng)
    k_pos = int(num_samples * pos_fraction)
    k_neg = num_samples - k_pos

    pos_mask = (labels == 1) & ok
    neg_mask = (labels == 0) & ok
    pos_key = jnp.where(pos_mask, jax.random.uniform(r_pos, (n,)), -jnp.inf)
    neg_key = jnp.where(neg_mask, jax.random.uniform(r_neg, (n,)), -jnp.inf)

    k_pos = min(k_pos, n)
    k_neg = min(k_neg, n)
    pos_vals, pos_idx = jax.lax.top_k(pos_key, k_pos)
    neg_vals, neg_idx = jax.lax.top_k(neg_key, k_neg)
    # Fixed slot layout: k_pos positive slots then k_neg negative slots; a
    # slot is valid only if a real fg/bg row landed in it. When positives are
    # scarce the effective sample shrinks (losses normalize by valid count) —
    # the static substitute for Detectron2's dynamic negative backfill.
    idx = jnp.concatenate([pos_idx, neg_idx])
    flags = jnp.concatenate(
        [jnp.ones((k_pos,), bool), jnp.zeros((k_neg,), bool)]
    )
    ok_all = jnp.concatenate([jnp.isfinite(pos_vals), jnp.isfinite(neg_vals)])
    return SampleResult(idx=idx, is_pos=flags, valid=ok_all)
