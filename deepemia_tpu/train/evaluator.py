"""COCO-style mAP evaluation (bbox + segm), self-contained numpy.

Replaces the Detectron2 ``COCOEvaluator + inference_on_dataset`` combination
the reference uses (evaluate_model.py:87-98, train_model.py:200-221) —
pycocotools is not available here, so the matching/AP math is implemented
directly: greedy score-ordered matching per (class, IoU threshold), 101-point
interpolated AP, averaged over classes and over IoU .50:.05:.95, maxDets=100.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence, Tuple

import numpy as np

log = logging.getLogger("deepemia_tpu.evaluator")

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4],[M,4] XYXY -> [N,M]."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


def mask_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,H,W],[M,H,W] bool -> [N,M]."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    af = a.reshape(len(a), -1).astype(np.float32)
    bf = b.reshape(len(b), -1).astype(np.float32)
    inter = af @ bf.T
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    return np.where(union > 0, inter / union, 0.0).astype(np.float32)


class APAccumulator:
    """Per-class accumulation of scored matches across a dataset."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        # per class: list of (score, is_tp[num_thresholds]) plus GT count
        self.records: List[List[Tuple[float, np.ndarray]]] = [
            [] for _ in range(num_classes)
        ]
        self.num_gt = np.zeros(num_classes, np.int64)

    def add_image(
        self,
        pred_classes: np.ndarray,
        pred_scores: np.ndarray,
        iou: np.ndarray,  # [Npred, Ngt] for the chosen iou type
        gt_classes: np.ndarray,
        max_dets: int = 100,
    ):
        for c in range(self.num_classes):
            gt_idx = np.flatnonzero(gt_classes == c)
            self.num_gt[c] += len(gt_idx)
            p_idx = np.flatnonzero(pred_classes == c)
            if len(p_idx) == 0:
                continue
            order = p_idx[np.argsort(-pred_scores[p_idx])][:max_dets]
            sub_iou = iou[np.ix_(order, gt_idx)] if len(gt_idx) else None
            tp = np.zeros((len(order), len(IOU_THRESHOLDS)), bool)
            for ti, t in enumerate(IOU_THRESHOLDS):
                taken = np.zeros(len(gt_idx), bool)
                for pi in range(len(order)):
                    if sub_iou is None:
                        break
                    candidates = np.where(~taken, sub_iou[pi], -1.0)
                    if candidates.size == 0:
                        continue
                    best = int(np.argmax(candidates))
                    if candidates[best] >= t:
                        taken[best] = True
                        tp[pi, ti] = True
            for pi, p in enumerate(order):
                self.records[c].append((float(pred_scores[p]), tp[pi]))

    def summarize(self) -> Dict[str, float]:
        """AP, AP50, AP75 (+ per-class AP) in percent, COCO conventions."""
        ap_per_class = np.full((self.num_classes, len(IOU_THRESHOLDS)), np.nan)
        for c in range(self.num_classes):
            if self.num_gt[c] == 0:
                continue
            recs = sorted(self.records[c], key=lambda r: -r[0])
            if not recs:
                ap_per_class[c] = 0.0
                continue
            tps = np.stack([r[1] for r in recs])  # [Np, T]
            for ti in range(len(IOU_THRESHOLDS)):
                tp_cum = np.cumsum(tps[:, ti])
                fp_cum = np.cumsum(~tps[:, ti])
                recall = tp_cum / self.num_gt[c]
                precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
                # monotone non-increasing precision envelope
                for i in range(len(precision) - 2, -1, -1):
                    precision[i] = max(precision[i], precision[i + 1])
                # 101-point interpolation
                idx = np.searchsorted(recall, RECALL_POINTS, side="left")
                prec_at = np.where(
                    idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0
                )
                ap_per_class[c, ti] = prec_at.mean()
        valid = ~np.isnan(ap_per_class[:, 0])
        out: Dict[str, float] = {}
        if valid.any():
            out["AP"] = float(np.nanmean(ap_per_class) * 100)
            out["AP50"] = float(np.nanmean(ap_per_class[:, 0]) * 100)
            out["AP75"] = float(np.nanmean(ap_per_class[:, 5]) * 100)
            for c in range(self.num_classes):
                if valid[c]:
                    out[f"AP-class{c}"] = float(np.nanmean(ap_per_class[c]) * 100)
        else:
            out = {"AP": float("nan"), "AP50": float("nan"), "AP75": float("nan")}
        return out


def evaluate_predictions(
    per_image: Sequence[dict], num_classes: int
) -> Dict[str, float]:
    """per_image: dicts with pred_boxes [N,4], pred_scores [N], pred_classes
    [N], pred_masks [N,H,W] (optional), gt_boxes [G,4], gt_classes [G],
    gt_masks [G,H,W] (optional). Returns {'bbox/AP', ..., 'segm/AP', ...}."""
    bbox_acc = APAccumulator(num_classes)
    has_masks = any("pred_masks" in d and d["pred_masks"] is not None for d in per_image)
    segm_acc = APAccumulator(num_classes) if has_masks else None

    for d in per_image:
        iou_b = box_iou_np(np.asarray(d["pred_boxes"]), np.asarray(d["gt_boxes"]))
        bbox_acc.add_image(
            np.asarray(d["pred_classes"]),
            np.asarray(d["pred_scores"]),
            iou_b,
            np.asarray(d["gt_classes"]),
        )
        if segm_acc is not None and d.get("pred_masks") is not None:
            iou_m = mask_iou_np(
                np.asarray(d["pred_masks"]), np.asarray(d["gt_masks"])
            )
            segm_acc.add_image(
                np.asarray(d["pred_classes"]),
                np.asarray(d["pred_scores"]),
                iou_m,
                np.asarray(d["gt_classes"]),
            )

    out = {f"bbox/{k}": v for k, v in bbox_acc.summarize().items()}
    if segm_acc is not None:
        out.update({f"segm/{k}": v for k, v in segm_acc.summarize().items()})
    return out
