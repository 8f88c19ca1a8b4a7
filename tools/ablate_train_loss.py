"""Attribute the ~77 ms device train step by ablation.

The env's tensorboard xplane converter is broken, so instead of a per-op
trace this measures grad(loss) wall time (with a REAL device->host sync —
block_until_ready does not block on the axon platform) for a stack of loss
variants, each dropping one stage. The delta against the full loss is that
stage's fwd+bwd cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache(
    env_var="DEEPEMIA_TPU_BENCH_XLA_CACHE",
    default_base=os.path.join(
        os.path.expanduser("~"), ".cache", "deepemia_tpu_bench_xla"
    ),
)

from deepemia_tpu.config.constants import StaticShapes
from deepemia_tpu.models import anchors as anchor_lib
from deepemia_tpu.models.mask_rcnn import MaskRCNN, build_model, init_params
from deepemia_tpu.models.roi_align import roi_align_level
from deepemia_tpu.models.rpn import select_proposals
from deepemia_tpu.train import losses as L
from deepemia_tpu.train import targets as T
from deepemia_tpu.train.losses import GroundTruth


def variant_loss(model, params, image, gt, rng, *, rpn_match=True,
                 proposals_on=True, roi_heads_on=True, mask_on=True,
                 crop_on=True):
    """maskrcnn_loss with stages optionally stubbed (constant-folded out)."""
    num_classes = model.num_classes
    h, w = image.shape[0], image.shape[1]
    r_rpn, r_roi = jax.random.split(rng)

    feats = model.apply(params, image, method=MaskRCNN.features)
    logits, regs = model.apply(params, feats, method=MaskRCNN.rpn_forward)
    feat_shapes = {k: (v.shape[0], v.shape[1]) for k, v in feats.items()}
    anchors = anchor_lib.all_anchors(feat_shapes)

    total = jnp.float32(0)
    if rpn_match:
        rl = L.rpn_losses(logits, regs, anchors, gt.boxes, gt.valid, r_rpn)
        total = total + rl["rpn_cls"] + rl["rpn_loc"]
    else:
        # keep the RPN conv outputs alive without the matcher/subsampler
        total = total + sum(jnp.sum(v) * 0 for v in logits.values())

    if not proposals_on:
        return total

    proposals = select_proposals(
        logits, regs, anchors, (h, w),
        pre_nms_topk=StaticShapes.PRE_NMS_TOPK_TRAIN,
        post_nms_topk=StaticShapes.POST_NMS_TOPK_TRAIN,
    )
    prop_boxes = jax.lax.stop_gradient(
        jnp.concatenate([proposals.boxes, gt.boxes])
    )
    prop_valid = jnp.concatenate([proposals.valid, gt.valid])
    if not roi_heads_on:
        return total + jnp.sum(prop_boxes) * 0

    match = T.match_proposals(prop_boxes, gt.boxes, gt.valid)
    sample = T.subsample(
        match.labels, r_roi, L.ROI_BATCH, L.ROI_POS_FRACTION,
        extra_valid=prop_valid,
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
    cls_target = jnp.where(s_fg, gt.classes[s_gt_idx], num_classes)
    log_probs = jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(log_probs, cls_target[:, None], axis=1)[:, 0]
    total = total + jnp.sum(ce * s_valid) / normalizer
    total = total + jnp.sum(deltas.astype(jnp.float32)) * 0

    if not mask_on:
        return total

    m_boxes = s_boxes[: L.MASK_ROIS]
    m_fg = s_fg[: L.MASK_ROIS]
    m_gt_idx = s_gt_idx[: L.MASK_ROIS]
    m_cls = jnp.clip(cls_target[: L.MASK_ROIS], 0, num_classes - 1)
    mask_logits = model.apply(
        params, roi_feats, m_boxes, method=MaskRCNN.mask_forward
    )
    sel_mask = jnp.take_along_axis(
        mask_logits.astype(jnp.float32),
        m_cls[:, None, None, None].repeat(28, 1).repeat(28, 2),
        axis=3,
    )[..., 0]

    if crop_on:
        def crop_gt(box, gidx):
            m = gt.masks[gidx].astype(jnp.float32)[..., None]
            out = roi_align_level(m, box[None], stride=1, output_size=28)
            return out[0, :, :, 0] >= 0.5

        gt_crops = jax.vmap(crop_gt)(m_boxes, m_gt_idx)
    else:
        gt_crops = jnp.zeros((L.MASK_ROIS, 28, 28), bool)
    mask_bce = L.bce_with_logits(sel_mask, gt_crops.astype(jnp.float32))
    m_norm = jnp.maximum(m_fg.sum(), 1.0)
    return total + jnp.sum(mask_bce.mean(axis=(1, 2)) * m_fg) / m_norm


def main():
    size = 512
    gmax = 64
    b = 2
    model = build_model("R50", num_classes=2, use_bf16=True)
    params = init_params(model, (size, size))

    npr = np.random.default_rng(0)
    images = jnp.asarray(
        (npr.random((b, size, size, 3)) * 255).astype(np.float32)
    )
    boxes = np.zeros((b, gmax, 4), np.float32)
    for i in range(b):
        for j in range(6):
            x0, y0 = npr.uniform(0, size - 64, 2)
            boxes[i, j] = [x0, y0, x0 + npr.uniform(16, 64), y0 + npr.uniform(16, 64)]
    gts = GroundTruth(
        boxes=jnp.asarray(boxes),
        classes=jnp.zeros((b, gmax), jnp.int32),
        valid=jnp.asarray(np.arange(gmax)[None, :].repeat(b, 0) < 6),
        masks=jnp.asarray(npr.random((b, gmax, size, size)) > 0.8),
    )
    keys = jnp.asarray(np.stack([[0, 1], [0, 2]]).astype(np.uint32))

    def measure(label, **flags):
        def batched(p):
            def per_image(img, gb, gc, gv, gm, k):
                gt = GroundTruth(boxes=gb, classes=gc, valid=gv, masks=gm)
                return variant_loss(model, p, img, gt, k, **flags)

            return jnp.mean(
                jax.vmap(per_image)(
                    images, gts.boxes, gts.classes, gts.valid, gts.masks, keys
                )
            )

        g = jax.jit(jax.value_and_grad(batched))
        v, _ = g(params)
        np.asarray(v)  # real sync (block_until_ready lies on axon)
        n = 15
        t0 = time.perf_counter()
        for _ in range(n):
            v, grads = g(params)
        np.asarray(v)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{label:42s} {dt:7.1f} ms")
        return dt

    full = measure("full grad(loss) B=2")
    measure("  - gt mask crop (crop_on=False)", crop_on=False)
    measure("  - mask head entirely (mask_on=False)", mask_on=False)
    measure("  - roi heads (roi_heads_on=False)", roi_heads_on=False)
    measure("  - proposals too (proposals_on=False)", proposals_on=False)
    measure(
        "  - rpn match (backbone+rpn convs only)",
        rpn_match=False,
        proposals_on=False,
    )
    print(f"(full = {full:.1f} ms; deltas between consecutive rows attribute stages)")


if __name__ == "__main__":
    main()
