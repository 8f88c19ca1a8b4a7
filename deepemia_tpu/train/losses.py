"""Mask R-CNN training losses (per image), statically shaped.

The loss stack Detectron2 computes inside the reference's
``DefaultTrainer.train()`` (train_model.py:184-195), rebuilt as pure
functions: RPN objectness BCE + box L1 on sampled anchors, RoI softmax CE +
class-specific box L1, mask BCE on foreground proposals — all over padded
samples with validity masks, normalized by valid counts.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from deepemia_tpu.config.constants import StaticShapes
from deepemia_tpu.models.roi_align import roi_align_level
from deepemia_tpu.models import anchors as anchor_lib
from deepemia_tpu.models.anchors import LEVELS
from deepemia_tpu.models.mask_rcnn import MaskRCNN
from deepemia_tpu.models.rpn import select_proposals
from deepemia_tpu.ops import boxes as box_ops
from deepemia_tpu.train import targets as T

RPN_BATCH = 256
RPN_POS_FRACTION = 0.5
ROI_BATCH = 512
ROI_POS_FRACTION = 0.25
MASK_ROIS = 128  # = ROI_BATCH * ROI_POS_FRACTION slots (positives-first)


def smooth_l1(x: jnp.ndarray, beta: float = 0.0) -> jnp.ndarray:
    """Detectron2 smooth_l1_loss (beta=0 -> pure L1, the default)."""
    if beta <= 0:
        return jnp.abs(x)
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def bce_with_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def rpn_losses(
    logits: Dict[str, jnp.ndarray],
    regs: Dict[str, jnp.ndarray],
    anchors: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    num_samples: int = RPN_BATCH,
) -> Dict[str, jnp.ndarray]:
    flat_logits = jnp.concatenate(
        [logits[lv].reshape(-1) for lv in LEVELS if lv in logits]
    )
    flat_regs = jnp.concatenate(
        [regs[lv].reshape(-1, 4) for lv in LEVELS if lv in regs]
    )
    flat_anchors = jnp.concatenate([anchors[lv] for lv in LEVELS if lv in anchors])

    match = T.match_anchors(flat_anchors, gt_boxes, gt_valid)
    sample = T.subsample(match.labels, rng, num_samples, RPN_POS_FRACTION)

    s_logits = flat_logits[sample.idx]
    s_labels = sample.is_pos.astype(jnp.float32)
    s_valid = sample.valid
    normalizer = jnp.maximum(s_valid.sum(), 1.0)

    cls_loss = jnp.sum(
        bce_with_logits(s_logits, s_labels) * s_valid
    ) / normalizer

    pos = sample.is_pos & s_valid
    s_anchors = flat_anchors[sample.idx]
    s_gt = gt_boxes[match.gt_index[sample.idx]]
    delta_targets = box_ops.get_deltas(s_anchors, s_gt, weights=(1.0, 1.0, 1.0, 1.0))
    s_regs = flat_regs[sample.idx]
    loc = jnp.sum(
        smooth_l1(s_regs - delta_targets).sum(axis=-1) * pos
    ) / normalizer
    return {"rpn_cls": cls_loss, "rpn_loc": loc}


class GroundTruth(NamedTuple):
    """Padded per-image GT: boxes [G,4] XYXY, classes [G], valid [G],
    masks [G,H,W] bool (full-resolution rasterized polygons)."""

    boxes: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    masks: jnp.ndarray


def maskrcnn_loss(
    model: MaskRCNN,
    params,
    image: jnp.ndarray,
    gt: GroundTruth,
    rng: jax.Array,
    pre_nms_topk: int = StaticShapes.PRE_NMS_TOPK_TRAIN,
    post_nms_topk: int = StaticShapes.POST_NMS_TOPK_TRAIN,
    rpn_batch: int = RPN_BATCH,
    roi_batch: int = ROI_BATCH,
    mask_rois: int = MASK_ROIS,
) -> Dict[str, jnp.ndarray]:
    """Full single-image training loss (sum of 5 terms + components).

    The static capacities are parameters so small-shape programs (CI, the
    multi-chip dry run) compile fast; production uses Detectron2 defaults.
    """
    num_classes = model.num_classes
    h, w = image.shape[0], image.shape[1]
    r_rpn, r_roi = jax.random.split(rng)

    feats = model.apply(params, image, method=MaskRCNN.features)
    logits, regs = model.apply(params, feats, method=MaskRCNN.rpn_forward)
    feat_shapes = {k: (v.shape[0], v.shape[1]) for k, v in feats.items()}
    anchors = anchor_lib.all_anchors(feat_shapes)

    losses = rpn_losses(
        logits, regs, anchors, gt.boxes, gt.valid, r_rpn, num_samples=rpn_batch
    )

    proposals = select_proposals(
        logits,
        regs,
        anchors,
        (h, w),
        pre_nms_topk=pre_nms_topk,
        post_nms_topk=post_nms_topk,
    )
    # proposals are constants w.r.t. the loss (Detectron2 detaches them)
    prop_boxes = jax.lax.stop_gradient(
        jnp.concatenate([proposals.boxes, gt.boxes])  # append GT (D2 default)
    )
    prop_valid = jnp.concatenate([proposals.valid, gt.valid])

    match = T.match_proposals(prop_boxes, gt.boxes, gt.valid)
    sample = T.subsample(
        match.labels, r_roi, roi_batch, ROI_POS_FRACTION, extra_valid=prop_valid
    )
    s_boxes = prop_boxes[sample.idx]
    s_gt_idx = match.gt_index[sample.idx]
    s_fg = sample.is_pos & sample.valid
    s_valid = sample.valid
    normalizer = jnp.maximum(s_valid.sum(), 1.0)

    roi_feats = {k: feats[k] for k in ("p2", "p3", "p4", "p5")}
    scores, deltas = model.apply(
        params, roi_feats, s_boxes, method=MaskRCNN.box_forward
    )

    # classification: fg -> gt class, bg -> num_classes (last index)
    cls_target = jnp.where(s_fg, gt.classes[s_gt_idx], num_classes)
    log_probs = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(log_probs, cls_target[:, None], axis=1)[:, 0]
    losses["cls"] = jnp.sum(ce * s_valid) / normalizer

    # class-specific box regression on fg rows
    delta_targets = box_ops.get_deltas(s_boxes, gt.boxes[s_gt_idx])
    deltas_per_class = deltas.reshape(-1, num_classes, 4).astype(jnp.float32)
    sel = jnp.clip(cls_target, 0, num_classes - 1)
    picked = jnp.take_along_axis(
        deltas_per_class, sel[:, None, None].repeat(4, axis=2), axis=1
    )[:, 0]
    losses["box"] = jnp.sum(
        smooth_l1(picked - delta_targets).sum(axis=-1) * s_fg
    ) / normalizer

    # mask head on the positives-first slot prefix
    m_boxes = s_boxes[:mask_rois]
    m_fg = s_fg[:mask_rois]
    m_gt_idx = s_gt_idx[:mask_rois]
    m_cls = jnp.clip(cls_target[:mask_rois], 0, num_classes - 1)
    mask_logits = model.apply(
        params, roi_feats, m_boxes, method=MaskRCNN.mask_forward
    )  # [M,28,28,C]
    sel_mask = jnp.take_along_axis(
        mask_logits.astype(jnp.float32),
        m_cls[:, None, None, None].repeat(28, 1).repeat(28, 2),
        axis=3,
    )[..., 0]

    # NOTE(perf): a row-gather reformulation of this crop (gathering only
    # the 2·P needed mask rows per RoI from a [G·H, W] stack) was measured
    # 48 ms/step SLOWER on v5e — its per-column take_along_axis lowers to
    # ~400k single-element gather descriptors. The full-mask gather +
    # roi_align_level keeps the column selection inside one fused program.
    def crop_gt(box, gidx):
        m = gt.masks[gidx].astype(jnp.float32)[..., None]  # [H,W,1]
        out = roi_align_level(m, box[None], stride=1, output_size=28)
        return out[0, :, :, 0] >= 0.5

    gt_crops = jax.vmap(crop_gt)(m_boxes, m_gt_idx)
    mask_bce = bce_with_logits(sel_mask, gt_crops.astype(jnp.float32))
    m_norm = jnp.maximum(m_fg.sum(), 1.0)
    losses["mask"] = jnp.sum(
        mask_bce.mean(axis=(1, 2)) * m_fg
    ) / m_norm

    losses["total"] = (
        losses["rpn_cls"]
        + losses["rpn_loc"]
        + losses["cls"]
        + losses["box"]
        + losses["mask"]
    )
    return losses
