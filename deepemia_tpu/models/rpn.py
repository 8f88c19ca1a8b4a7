"""Region Proposal Network: head + statically-shaped proposal selection.

The Detectron2 RPN the reference depends on performs per-level top-k,
delta decoding, and level-wise NMS with dynamic instance counts; here every
stage is padded to static capacities with validity masks (SURVEY.md §7) so the
whole proposal machinery compiles into the same XLA program as the backbone.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepemia_tpu.config.constants import StaticShapes
from deepemia_tpu.models.anchors import LEVELS, NUM_ANCHORS_PER_CELL
from deepemia_tpu.ops import boxes as box_ops


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/delta predictors, applied per level."""

    in_channels: int = 256
    num_anchors: int = NUM_ANCHORS_PER_CELL
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]):
        conv = nn.Conv(
            self.in_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            name="conv",
        )
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness")
        deltas = nn.Conv(
            self.num_anchors * 4, (1, 1), dtype=self.dtype, name="anchor_deltas"
        )
        logits, regs = {}, {}
        for lv, x in feats.items():
            t = nn.relu(conv(x))
            logits[lv] = obj(t)
            regs[lv] = deltas(t)
        return logits, regs


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # [K,4]
    scores: jnp.ndarray  # [K] objectness (sigmoid)
    valid: jnp.ndarray  # [K] bool


def select_proposals(
    logits: Dict[str, jnp.ndarray],
    regs: Dict[str, jnp.ndarray],
    anchors: Dict[str, jnp.ndarray],
    image_hw: Tuple[int, int],
    pre_nms_topk: int = StaticShapes.PRE_NMS_TOPK_TEST,
    post_nms_topk: int = StaticShapes.POST_NMS_TOPK_TEST,
    nms_threshold: float = 0.7,
    min_size: float = 0.0,
) -> Proposals:
    """Decode + select proposals for ONE image (no batch dim on inputs).

    Mirrors Detectron2 find_top_rpn_proposals: per-level top-k by objectness,
    delta decode (weights (1,1,1,1)), clip to image, drop tiny boxes, NMS per
    level (level-offset trick), global top ``post_nms_topk``.
    """
    all_boxes, all_scores, all_valid = [], [], []
    k_max = 0
    for lv in LEVELS:
        if lv not in logits:
            continue
        score = logits[lv].reshape(-1).astype(jnp.float32)  # [H*W*A]
        delta = regs[lv].reshape(-1, 4).astype(jnp.float32)
        anch = anchors[lv]
        k = min(pre_nms_topk, score.shape[0])
        k_max = max(k_max, k)
        top_scores, idx = jax.lax.top_k(score, k)
        boxes = box_ops.apply_deltas(
            anch[idx], delta[idx], weights=(1.0, 1.0, 1.0, 1.0)
        )
        boxes = box_ops.clip_boxes(boxes, image_hw[0], image_hw[1])
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        valid = (w > min_size) & (h > min_size)
        all_boxes.append(boxes)
        all_scores.append(top_scores)
        all_valid.append(valid)

    # Boxes of different levels never suppress each other (Detectron2's
    # level-offset batched NMS), so run NMS per level, vmapped over a
    # [L, k_max] stack: L small matrices instead of one (L*k)^2 monster —
    # 4.7x less IoU-matrix work and 5x fewer sequential NMS scan steps at
    # the 1024-tile geometry (monolithic NMS measured at 1.7 ms/tile on
    # v5e, tools/profile_p2_kernels.py).
    def _pad(x, fill):
        p = k_max - x.shape[0]
        return jnp.pad(x, ((0, p),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill) if p else x

    boxes_l = jnp.stack([_pad(b, 0.0) for b in all_boxes])
    scores_l = jnp.stack([_pad(s, -jnp.inf) for s in all_scores])
    valid_l = jnp.stack([_pad(v, False) for v in all_valid])

    keep_l = jax.vmap(
        lambda b, s, v: box_ops.nms_mask(b, s, nms_threshold, valid=v)
    )(boxes_l, scores_l, valid_l)

    boxes = boxes_l.reshape(-1, 4)
    scores = scores_l.reshape(-1)
    keep = keep_l.reshape(-1)
    sel_scores = jnp.where(keep, scores, -jnp.inf)
    k = min(post_nms_topk, boxes.shape[0])
    top, idx = jax.lax.top_k(sel_scores, k)
    return Proposals(
        boxes=boxes[idx],
        scores=jax.nn.sigmoid(top),
        valid=jnp.isfinite(top),
    )
