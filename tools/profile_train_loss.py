"""Component-level timing of the training loss forward at 512**2.

Round-3 lead #1: the training FORWARD costs ~20 ms/image vs the inference
engine's ~2.4 ms equivalent. This script times each stage of
``train.losses.maskrcnn_loss`` in isolation (jitted, donated, best-of) to
attribute the difference before optimizing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.config.constants import StaticShapes
from deepemia_tpu.models import anchors as anchor_lib
from deepemia_tpu.models.mask_rcnn import MaskRCNN
from deepemia_tpu.models.roi_align import roi_align_level
from deepemia_tpu.models.rpn import select_proposals
from deepemia_tpu.train import losses as L
from deepemia_tpu.train import targets as T
from deepemia_tpu.train.losses import GroundTruth


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    size = 512
    gmax = 8
    rng = jax.random.PRNGKey(0)
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    model = build_model("R50", num_classes=2, use_bf16=True)
    image = jax.random.uniform(rng, (size, size, 3), jnp.float32) * 255
    params = init_params(model, (size, size))

    npr = np.random.default_rng(0)
    boxes = []
    for _ in range(gmax):
        x0, y0 = npr.uniform(0, size - 64, 2)
        boxes.append([x0, y0, x0 + npr.uniform(16, 64), y0 + npr.uniform(16, 64)])
    gt = GroundTruth(
        boxes=jnp.asarray(boxes, jnp.float32),
        classes=jnp.asarray(npr.integers(0, 2, gmax), jnp.int32),
        valid=jnp.ones((gmax,), bool),
        masks=jnp.asarray(npr.random((gmax, size, size)) > 0.7),
    )

    feats = jax.jit(lambda p, im: model.apply(p, im, method=MaskRCNN.features))(
        params, image
    )
    jax.block_until_ready(feats)
    feat_shapes = {k: (v.shape[0], v.shape[1]) for k, v in feats.items()}
    anchors = anchor_lib.all_anchors(feat_shapes)
    n_anchors = sum(int(a.shape[0]) for a in anchors.values())
    print(f"anchors total: {n_anchors}")

    t_feat = timeit(
        jax.jit(lambda p, im: model.apply(p, im, method=MaskRCNN.features)),
        params,
        image,
    )
    print(f"features (backbone+fpn):      {t_feat:7.2f} ms")

    rpn_fn = jax.jit(lambda p, f: model.apply(p, f, method=MaskRCNN.rpn_forward))
    logits, regs = rpn_fn(params, feats)
    jax.block_until_ready((logits, regs))
    t_rpn = timeit(rpn_fn, params, feats)
    print(f"rpn conv forward:             {t_rpn:7.2f} ms")

    t_match = timeit(
        jax.jit(
            lambda gb, gv: T.match_anchors(
                jnp.concatenate([anchors[lv] for lv in anchors]), gb, gv
            )
        ),
        gt.boxes,
        gt.valid,
    )
    print(f"match_anchors ({n_anchors}):     {t_match:7.2f} ms")

    sel_fn = jax.jit(
        lambda lo, re: select_proposals(
            lo,
            re,
            anchors,
            (size, size),
            pre_nms_topk=StaticShapes.PRE_NMS_TOPK_TRAIN,
            post_nms_topk=StaticShapes.POST_NMS_TOPK_TRAIN,
        )
    )
    props = sel_fn(logits, regs)
    jax.block_until_ready(props)
    t_sel = timeit(sel_fn, logits, regs)
    print(f"select_proposals (train k):   {t_sel:7.2f} ms")

    prop_boxes = jnp.concatenate([props.boxes, gt.boxes])
    t_pmatch = timeit(
        jax.jit(lambda pb, gb, gv: T.match_proposals(pb, gb, gv)),
        prop_boxes,
        gt.boxes,
        gt.valid,
    )
    print(f"match_proposals:              {t_pmatch:7.2f} ms")

    s_boxes = prop_boxes[: L.ROI_BATCH]
    roi_feats = {k: feats[k] for k in ("p2", "p3", "p4", "p5")}
    box_fn = jax.jit(
        lambda p, f, b: model.apply(p, f, b, method=MaskRCNN.box_forward)
    )
    jax.block_until_ready(box_fn(params, roi_feats, s_boxes))
    t_box = timeit(box_fn, params, roi_feats, s_boxes)
    print(f"box head ({L.ROI_BATCH} rois):        {t_box:7.2f} ms")

    m_boxes = s_boxes[: L.MASK_ROIS]
    mask_fn = jax.jit(
        lambda p, f, b: model.apply(p, f, b, method=MaskRCNN.mask_forward)
    )
    jax.block_until_ready(mask_fn(params, roi_feats, m_boxes))
    t_mask = timeit(mask_fn, params, roi_feats, m_boxes)
    print(f"mask head ({L.MASK_ROIS} rois):        {t_mask:7.2f} ms")

    gidx = jnp.zeros((L.MASK_ROIS,), jnp.int32)

    def crop_all(masks, mb, gi):
        def crop_gt(box, g):
            m = masks[g].astype(jnp.float32)[..., None]
            out = roi_align_level(m, box[None], stride=1, output_size=28)
            return out[0, :, :, 0] >= 0.5

        return jax.vmap(crop_gt)(mb, gi)

    crop_fn = jax.jit(crop_all)
    jax.block_until_ready(crop_fn(gt.masks, m_boxes, gidx))
    t_crop = timeit(crop_fn, gt.masks, m_boxes, gidx)
    print(f"gt mask crop ({L.MASK_ROIS}):          {t_crop:7.2f} ms")

    # whole loss for reference
    loss_fn = jax.jit(lambda p, im, g, r: L.maskrcnn_loss(model, p, im, g, r))
    jax.block_until_ready(loss_fn(params, image, gt, rng))
    t_loss = timeit(loss_fn, params, image, gt, rng, n=10)
    print(f"maskrcnn_loss total:          {t_loss:7.2f} ms")

    grad_fn = jax.jit(
        jax.grad(lambda p, im, g, r: L.maskrcnn_loss(model, p, im, g, r)["total"])
    )
    jax.block_until_ready(grad_fn(params, image, gt, rng))
    t_grad = timeit(grad_fn, params, image, gt, rng, n=10)
    print(f"grad(maskrcnn_loss):          {t_grad:7.2f} ms")


if __name__ == "__main__":
    main()
