"""Torch/numpy full-detector oracle (VERDICT r2 missing #2).

A from-scratch DYNAMIC re-implementation of the Detectron2 Mask R-CNN
inference chain — trunk/FPN/RPN (torch, reusing the replicas in
test_weights), plus independent numpy implementations of anchor
generation, proposal selection, adaptive-sampling RoIAlign (the CUDA op's
exact boundary semantics), FastRCNN per-class inference, greedy NMS, and
mask paste. Consumes a Detectron2-named state dict and produces
detections, so the statically-shaped Flax chain can be compared
DETECTION-FOR-DETECTION (reference surface:
src/data/models.py:134-160 DefaultPredictor; decision chain semantics
from detectron2's rpn/fast_rcnn/mask_head/paste ops).

Deliberately shares no code with deepemia_tpu's compute path: every stage
here is a second, dynamic implementation of the same math.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np
import torch
import torch.nn.functional as F

from tests.test_weights import _t, _torch_fpn

PIXEL_MEAN_BGR = (103.53, 116.28, 123.675)
STRIDES = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
SIZES = {"p2": 32.0, "p3": 64.0, "p4": 128.0, "p5": 256.0, "p6": 512.0}
RATIOS = (0.5, 1.0, 2.0)
BN_EPS = 1e-5


def _bn_any(sd, prefix, x):
    """BN from running stats when present, else the pre-folded affine pair
    (exported checkpoints carry scale/bias only)."""
    if f"{prefix}.running_mean" in sd:
        return F.batch_norm(
            x,
            _t(sd[f"{prefix}.running_mean"]),
            _t(sd[f"{prefix}.running_var"]),
            _t(sd[f"{prefix}.weight"]),
            _t(sd[f"{prefix}.bias"]),
            training=False,
            eps=BN_EPS,
        )
    w = _t(sd[f"{prefix}.weight"]).view(1, -1, 1, 1)
    b = _t(sd[f"{prefix}.bias"]).view(1, -1, 1, 1)
    return x * w + b


def _torch_trunk_any(sd, x, depth):
    """Detectron2 trunk semantics (stem 7x7/2 + BN + relu + maxpool,
    bottlenecks with STRIDE_IN_1X1) tolerating affine-only norms — exported
    checkpoints carry folded scale/bias without running stats."""
    from deepemia_tpu.models.resnet import STAGE_BLOCKS

    bu = "backbone.bottom_up"
    x = F.conv2d(x, _t(sd[f"{bu}.stem.conv1.weight"]), stride=2, padding=3)
    x = F.relu(_bn_any(sd, f"{bu}.stem.conv1.norm", x))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = {}
    for si, nb in enumerate(STAGE_BLOCKS[depth]):
        s = si + 2
        stage_stride = 1 if si == 0 else 2
        for b in range(nb):
            base = f"{bu}.res{s}.{b}"
            stride = stage_stride if b == 0 else 1
            if f"{base}.shortcut.weight" in sd:
                sc = F.conv2d(x, _t(sd[f"{base}.shortcut.weight"]), stride=stride)
                sc = _bn_any(sd, f"{base}.shortcut.norm", sc)
            else:
                sc = x
            y = F.conv2d(x, _t(sd[f"{base}.conv1.weight"]), stride=stride)
            y = F.relu(_bn_any(sd, f"{base}.conv1.norm", y))
            y = F.conv2d(y, _t(sd[f"{base}.conv2.weight"]), padding=1)
            y = F.relu(_bn_any(sd, f"{base}.conv2.norm", y))
            y = F.conv2d(y, _t(sd[f"{base}.conv3.weight"]))
            y = _bn_any(sd, f"{base}.conv3.norm", y)
            x = F.relu(y + sc)
        feats[f"res{s}"] = x
    return feats


def _anchors(level: str, fh: int, fw: int) -> np.ndarray:
    """[fh*fw*A, 4], cell-major then aspect — same enumeration order as
    deepemia_tpu.models.anchors.level_anchors (itself D2's order)."""
    stride = STRIDES[level]
    size = SIZES[level]
    base = []
    for r in RATIOS:
        w = math.sqrt(size * size / r)
        h = w * r
        base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.array(base, np.float64)
    sx = np.arange(fw, dtype=np.float64) * stride
    sy = np.arange(fh, dtype=np.float64) * stride
    gx, gy = np.meshgrid(sx, sy)
    shifts = np.stack([gx, gy, gx, gy], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def _apply_deltas(boxes, deltas, weights):
    """Box2BoxTransform.apply_deltas (D2 semantics incl. scale clamp)."""
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, deltas[:, 2] / ww, deltas[:, 3] / wh
    clamp = math.log(1000.0 / 16)
    dw = np.minimum(dw, clamp)
    dh = np.minimum(dh, clamp)
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = np.exp(dw) * widths
    ph = np.exp(dh) * heights
    return np.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], -1
    )


def _clip(boxes, h, w):
    out = boxes.copy()
    out[:, 0::2] = np.clip(out[:, 0::2], 0, w)
    out[:, 1::2] = np.clip(out[:, 1::2], 0, h)
    return out


def _nms(boxes, scores, thresh):
    """Greedy NMS, descending score, stable ties. Returns kept indices."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x0 = np.maximum(boxes[i, 0], boxes[:, 0])
        y0 = np.maximum(boxes[i, 1], boxes[:, 1])
        x1 = np.minimum(boxes[i, 2], boxes[:, 2])
        y1 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > thresh
        suppressed[i] = True
    return np.array(keep, np.int64)


def _roi_align_np(feat_hwc, box, stride, out_size, sampling_ratio=0):
    """D2 CUDA ROIAlignV2 semantics: aligned=True (half-pixel), adaptive
    per-axis sampling ratio ceil(roi/out) when sampling_ratio==0, exact
    boundary handling (samples outside [-1, size] contribute 0; coords
    clamped to [0, size-1]). Vectorized over the sample grid."""
    H, W, C = feat_hwc.shape
    x0 = box[0] / stride - 0.5
    y0 = box[1] / stride - 0.5
    bw = (box[2] - box[0]) / stride
    bh = (box[3] - box[1]) / stride
    rw = sampling_ratio if sampling_ratio > 0 else max(1, math.ceil(bw / out_size))
    rh = sampling_ratio if sampling_ratio > 0 else max(1, math.ceil(bh / out_size))
    # sample coords [out*r] per axis: bin i, sub k -> origin + (i + (k+.5)/r)/out * extent
    ys = y0 + (
        np.repeat(np.arange(out_size), rh) + (np.tile(np.arange(rh), out_size) + 0.5) / rh
    ) / out_size * bh
    xs = x0 + (
        np.repeat(np.arange(out_size), rw) + (np.tile(np.arange(rw), out_size) + 0.5) / rw
    ) / out_size * bw
    vy = (ys >= -1.0) & (ys <= H)
    vx = (xs >= -1.0) & (xs <= W)
    yy = np.clip(ys, 0.0, H - 1)
    xx = np.clip(xs, 0.0, W - 1)
    iy0 = np.floor(yy).astype(int)
    ix0 = np.floor(xx).astype(int)
    iy1 = np.minimum(iy0 + 1, H - 1)
    ix1 = np.minimum(ix0 + 1, W - 1)
    fy = (yy - iy0)[:, None, None]
    fx = (xx - ix0)[None, :, None]
    interp = (
        feat_hwc[np.ix_(iy0, ix0)] * (1 - fy) * (1 - fx)
        + feat_hwc[np.ix_(iy0, ix1)] * (1 - fy) * fx
        + feat_hwc[np.ix_(iy1, ix0)] * fy * (1 - fx)
        + feat_hwc[np.ix_(iy1, ix1)] * fy * fx
    )
    interp = interp * (vy[:, None, None] & vx[None, :, None])
    return interp.reshape(out_size, rh, out_size, rw, C).mean(axis=(1, 3))


def _assign_level(box):
    w = max(box[2] - box[0], 0)
    h = max(box[3] - box[1], 0)
    scale = math.sqrt(w * h)
    lvl = math.floor(4 + math.log2(max(scale, 1e-6) / 224.0))
    return int(min(max(lvl, 2), 5))


def _pool_multilevel(feats_hwc, boxes, out_size):
    pooled = []
    for b in boxes:
        lvl = _assign_level(b)
        name = f"p{lvl}"
        pooled.append(
            _roi_align_np(feats_hwc[name], b, STRIDES[name], out_size)
        )
    return np.stack(pooled) if pooled else np.zeros((0, out_size, out_size, 256))


def _paste_mask(prob28, box, h, w, thresh=0.5):
    """D2 paste_masks_in_image semantics: bilinear-sample the 28x28 grid
    over the box extent (half-pixel convention), threshold."""
    x0, y0, x1, y1 = box
    out = np.zeros((h, w), bool)
    ix0, iy0 = max(int(math.floor(x0)), 0), max(int(math.floor(y0)), 0)
    ix1, iy1 = min(int(math.ceil(x1)), w), min(int(math.ceil(y1)), h)
    if ix1 <= ix0 or iy1 <= iy0 or x1 <= x0 or y1 <= y0:
        return out
    R = prob28.shape[0]
    xs = (np.arange(ix0, ix1) + 0.5 - x0) / (x1 - x0) * R - 0.5
    ys = (np.arange(iy0, iy1) + 0.5 - y0) / (y1 - y0) * R - 0.5
    # grid_sample(align_corners=False, padding_mode='zeros'): out-of-grid
    # texels contribute zero (not edge clamp)
    gx0 = np.floor(xs).astype(int)
    gy0 = np.floor(ys).astype(int)
    vx0 = (gx0 >= 0) & (gx0 <= R - 1)
    vx1 = (gx0 + 1 >= 0) & (gx0 + 1 <= R - 1)
    vy0 = (gy0 >= 0) & (gy0 <= R - 1)
    vy1 = (gy0 + 1 >= 0) & (gy0 + 1 <= R - 1)
    fx0 = np.clip(gx0, 0, R - 1)
    fx1 = np.clip(gx0 + 1, 0, R - 1)
    fy0 = np.clip(gy0, 0, R - 1)
    fy1 = np.clip(gy0 + 1, 0, R - 1)
    tx = xs - gx0
    ty = ys - gy0
    p00 = prob28[np.ix_(fy0, fx0)] * (vy0[:, None] & vx0[None, :])
    p01 = prob28[np.ix_(fy0, fx1)] * (vy0[:, None] & vx1[None, :])
    p10 = prob28[np.ix_(fy1, fx0)] * (vy1[:, None] & vx0[None, :])
    p11 = prob28[np.ix_(fy1, fx1)] * (vy1[:, None] & vx1[None, :])
    interp = (
        p00 * (1 - ty)[:, None] * (1 - tx)[None, :]
        + p01 * (1 - ty)[:, None] * tx[None, :]
        + p10 * ty[:, None] * (1 - tx)[None, :]
        + p11 * ty[:, None] * tx[None, :]
    )
    out[iy0:iy1, ix0:ix1] = interp >= thresh
    return out


def torch_predict(
    sd: Dict[str, np.ndarray],
    image_bgr: np.ndarray,
    num_classes: int,
    depth: int = 50,
    score_threshold: float = 0.05,
    nms_threshold: float = 0.5,
    pre_nms_topk: int = 1000,
    post_nms_topk: int = 1000,
    rpn_nms: float = 0.7,
    max_detections: int = 100,
    paste_masks: bool = True,
) -> Dict[str, np.ndarray]:
    """[H,W,3] float BGR image -> dict(boxes [N,4], scores [N], classes [N],
    masks [N,H,W] bool). Full dynamic Detectron2-semantics inference."""
    h, w = image_bgr.shape[:2]
    x = image_bgr.astype(np.float32) - np.asarray(PIXEL_MEAN_BGR, np.float32)
    x = np.transpose(x, (2, 0, 1))[None]

    with torch.no_grad():
        trunk = _torch_trunk_any(sd, _t(x), depth)
        fpn = _torch_fpn(sd, trunk)
        rh = "proposal_generator.rpn_head"
        logits, deltas = {}, {}
        for lv, f in fpn.items():
            t = F.relu(
                F.conv2d(
                    f, _t(sd[f"{rh}.conv.weight"]), _t(sd[f"{rh}.conv.bias"]),
                    padding=1,
                )
            )
            logits[lv] = F.conv2d(
                t,
                _t(sd[f"{rh}.objectness_logits.weight"]),
                _t(sd[f"{rh}.objectness_logits.bias"]),
            )
            deltas[lv] = F.conv2d(
                t,
                _t(sd[f"{rh}.anchor_deltas.weight"]),
                _t(sd[f"{rh}.anchor_deltas.bias"]),
            )

    # ---- proposal selection (find_top_rpn_proposals semantics) ----
    all_boxes, all_scores, all_lvls = [], [], []
    for li, lv in enumerate(("p2", "p3", "p4", "p5", "p6")):
        # NHWC flatten: (h*W + w)*A + a — matches anchor enumeration
        sc = np.transpose(logits[lv].numpy()[0], (1, 2, 0)).reshape(-1)
        dl = np.transpose(deltas[lv].numpy()[0], (1, 2, 0)).reshape(-1, 4)
        fh, fw = logits[lv].shape[2], logits[lv].shape[3]
        anch = _anchors(lv, fh, fw)
        k = min(pre_nms_topk, sc.shape[0])
        idx = np.argsort(-sc, kind="stable")[:k]
        b = _apply_deltas(anch[idx], dl[idx].astype(np.float64), (1, 1, 1, 1))
        b = _clip(b, h, w)
        ok = (b[:, 2] - b[:, 0] > 0) & (b[:, 3] - b[:, 1] > 0)
        all_boxes.append(b[ok])
        all_scores.append(sc[idx][ok])
        all_lvls.append(np.full(ok.sum(), li))
    pb = np.concatenate(all_boxes)
    ps = np.concatenate(all_scores)
    pl = np.concatenate(all_lvls)
    if len(pb):
        # level-aware NMS via coordinate offset
        extent = np.abs(pb).max() + 1
        keep = _nms(pb + pl[:, None] * extent, ps, rpn_nms)
        keep = keep[np.argsort(-ps[keep], kind="stable")][:post_nms_topk]
    else:
        keep = np.zeros(0, np.int64)
    proposals = pb[keep]

    # ---- box head + FastRCNN inference ----
    feats_hwc = {
        lv: np.transpose(fpn[lv].numpy()[0], (1, 2, 0)).astype(np.float64)
        for lv in ("p2", "p3", "p4", "p5")
    }
    pooled = _pool_multilevel(feats_hwc, proposals, 7)  # [N,7,7,256]
    with torch.no_grad():
        xb = _t(
            np.transpose(pooled, (0, 3, 1, 2)).astype(np.float32)
        ).flatten(1)
        bh_, bp_ = "roi_heads.box_head", "roi_heads.box_predictor"
        xb = F.relu(F.linear(xb, _t(sd[f"{bh_}.fc1.weight"]), _t(sd[f"{bh_}.fc1.bias"])))
        xb = F.relu(F.linear(xb, _t(sd[f"{bh_}.fc2.weight"]), _t(sd[f"{bh_}.fc2.bias"])))
        cls = F.linear(
            xb, _t(sd[f"{bp_}.cls_score.weight"]), _t(sd[f"{bp_}.cls_score.bias"])
        ).numpy()
        reg = F.linear(
            xb, _t(sd[f"{bp_}.bbox_pred.weight"]), _t(sd[f"{bp_}.bbox_pred.bias"])
        ).numpy()

    probs = torch.softmax(_t(cls.astype(np.float64)), dim=-1).numpy()[:, :num_classes]
    cand_boxes, cand_scores, cand_classes = [], [], []
    for c in range(num_classes):
        d = reg[:, 4 * c : 4 * c + 4].astype(np.float64)
        bc = _clip(_apply_deltas(proposals, d, (10, 10, 5, 5)), h, w)
        sel = probs[:, c] > score_threshold
        cand_boxes.append(bc[sel])
        cand_scores.append(probs[sel, c])
        cand_classes.append(np.full(int(sel.sum()), c))
    cb = np.concatenate(cand_boxes)
    cs = np.concatenate(cand_scores)
    cc = np.concatenate(cand_classes)
    if len(cb):
        extent = np.abs(cb).max() + 1
        keep = _nms(cb + cc[:, None] * extent, cs, nms_threshold)
        keep = keep[np.argsort(-cs[keep], kind="stable")][:max_detections]
    else:
        keep = np.zeros(0, np.int64)
    db, dscore, dcls = cb[keep], cs[keep], cc[keep]

    # ---- mask head on kept boxes ----
    masks = np.zeros((len(db), h, w), bool)
    if len(db):
        pooled_m = _pool_multilevel(feats_hwc, db, 14)
        with torch.no_grad():
            xm = _t(np.transpose(pooled_m, (0, 3, 1, 2)).astype(np.float32))
            mh = "roi_heads.mask_head"
            for i in (1, 2, 3, 4):
                xm = F.relu(
                    F.conv2d(
                        xm,
                        _t(sd[f"{mh}.mask_fcn{i}.weight"]),
                        _t(sd[f"{mh}.mask_fcn{i}.bias"]),
                        padding=1,
                    )
                )
            xm = F.relu(
                F.conv_transpose2d(
                    xm, _t(sd[f"{mh}.deconv.weight"]), _t(sd[f"{mh}.deconv.bias"]),
                    stride=2,
                )
            )
            ml = F.conv2d(
                xm, _t(sd[f"{mh}.predictor.weight"]), _t(sd[f"{mh}.predictor.bias"])
            ).numpy()  # [N,C,28,28]
        if paste_masks:
            for i in range(len(db)):
                prob = 1.0 / (1.0 + np.exp(-ml[i, dcls[i]].astype(np.float64)))
                masks[i] = _paste_mask(prob, db[i], h, w)

    return {
        "boxes": db.astype(np.float32),
        "scores": dscore.astype(np.float32),
        "classes": dcls.astype(np.int32),
        "masks": masks,
    }
