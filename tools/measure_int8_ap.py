"""Measure the quality cost of int8 backbone serving on a trained model.

Trains (or loads from --work) the parity harness's blob detector, then
evaluates the float chain vs quant_backbone='trunk'/'full' on held-out
images: bbox/segm AP against ground truth plus detection-for-detection
agreement with the float chain. This is the AP-delta evidence for
`performance.quantized_inference` (the reference's int8 path never ran, so
it never had this number either — SURVEY Q2).

Usage: python tools/measure_int8_ap.py [--steps 3000] [--n-test 10]
       [--work DIR] [--out INT8_AP.md]
"""

import argparse
import json
import logging
import os
import sys
import tempfile

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--steps", type=int, default=3000)
_ap.add_argument("--n-test", type=int, default=10)
_ap.add_argument("--work", default=None)
_ap.add_argument("--out", default="INT8_AP.md")
args = _ap.parse_args()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache()

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def main():
    os.environ.setdefault(
        "DEEPEMIA_TPU_HOME", os.path.join(tempfile.mkdtemp(), "home")
    )
    work = args.work or tempfile.mkdtemp(prefix="int8ap_")
    from deepemia_tpu.data.datasets import rasterize_annotations
    from deepemia_tpu.train.evaluator import evaluate_predictions
    from tests.parity_harness import (
        ensure_blob_detector,
        flax_predict_np,
        make_blob_records,
        match_detections,
        parity_model_dir,
    )

    train_recs = make_blob_records(os.path.join(work, "train_imgs"), 16, seed=0)
    test_recs = make_blob_records(
        os.path.join(work, "test_imgs"), args.n_test, seed=100
    )
    # same persistent model cache as the parity harness/test: the detector
    # is trained once (possibly on TPU via run_parity.py --train-only) and
    # every evidence tool evaluates the SAME checkpoint
    model, params, _sd, _metrics = ensure_blob_detector(
        train_recs, parity_model_dir(work, 50, args.steps), steps=args.steps
    )

    modes = ["none", "trunk", "full"]
    preds = {m: [] for m in modes}
    agree = {m: [] for m in modes}
    models = {m: model.clone(quant_backbone=m) for m in modes}
    for rec in test_recs:
        img = cv2.imread(rec["file_name"], cv2.IMREAD_COLOR)
        gt_masks = np.asarray(rasterize_annotations(rec))
        gt = {
            "gt_boxes": np.asarray(
                [a["bbox"] for a in rec["annotations"]], np.float32
            ),
            "gt_classes": np.asarray(
                [a["category_id"] for a in rec["annotations"]], np.int32
            ),
            "gt_masks": gt_masks,
        }
        dets = {}
        for m in modes:
            d = flax_predict_np(models[m], params, img)
            dets[m] = d
            preds[m].append(
                {
                    "pred_boxes": d["boxes"],
                    "pred_scores": d["scores"],
                    "pred_classes": d["classes"],
                    "pred_masks": d["masks"],
                    **gt,
                }
            )
        for m in ("trunk", "full"):
            agree[m].append(match_detections(dets["none"], dets[m]))

    aps = {m: evaluate_predictions(preds[m], 2) for m in modes}
    report = {"steps": args.steps, "n_test": args.n_test}
    lines = [
        "# INT8 — quantized-backbone quality on a trained model",
        "",
        "Float (f32) vs `quantized_inference: trunk` / `full` on the parity",
        f"harness's trained blob detector (R50, {args.steps} steps),",
        f"{args.n_test} held-out images, CPU backend.",
        "Regenerate: `python tools/measure_int8_ap.py`.",
        "",
        "| metric | float | trunk (int8 ResNet) | full (int8 ResNet+FPN) |",
        "|---|---|---|---|",
    ]
    for key in ("bbox/AP", "segm/AP"):
        row = [f"| {key} |"]
        for m in modes:
            row.append(f" {aps[m].get(key, float('nan')):.2f} |")
        lines.append("".join(row))
        report[key] = {m: float(aps[m].get(key, float("nan"))) for m in modes}
    lines += ["", "| agreement vs float | trunk | full |", "|---|---|---|"]
    for name, field in (
        ("detections matched (IoU>0.85, same class)", "match_rate"),
        ("matched among float score≥0.5", "conf_match_rate_a"),
        ("matched among int8 score≥0.5", "conf_match_rate_b"),
        ("matched score |Δ|≤0.05", "score_ok_rate"),
        ("matched pasted-mask IoU≥0.8", "mask_ok_rate"),
    ):
        vals = [
            float(np.mean([x[field] for x in agree[m]]))
            for m in ("trunk", "full")
        ]
        lines.append(f"| {name} | {vals[0]:.1%} | {vals[1]:.1%} |")
        report[field] = {"trunk": vals[0], "full": vals[1]}
    med = [
        float(np.mean([x["unmatched_a_median_score"] for x in agree[m]]))
        for m in ("trunk", "full")
    ]
    lines.append(
        f"| median score of unmatched float dets | {med[0]:.3f} |"
        f" {med[1]:.3f} |"
    )
    report["unmatched_a_median_score"] = {"trunk": med[0], "full": med[1]}
    lines += [
        "",
        "The all-detections match rate counts everything above the 0.05",
        "serving floor, so it is dominated by churn among near-threshold",
        "detections (see the unmatched-median row) that contribute almost",
        "nothing to AP; the score≥0.5 band is what the default 0.45/0.5",
        "thresholds actually consume.",
        "",
    ]
    for m in ("trunk", "full"):
        d_b = abs(report["bbox/AP"][m] - report["bbox/AP"]["none"])
        d_s = abs(report["segm/AP"][m] - report["segm/AP"]["none"])
        report[f"delta_ap_{m}"] = {"bbox": d_b, "segm": d_s}
        met = d_b < 1.0 and d_s < 1.0
        lines.append(
            f"`{m}`: |Δ bbox AP| = {d_b:.2f}, |Δ segm AP| = {d_s:.2f} — "
            f"budget < 1.0 {'met' if met else 'NOT met'}."
        )
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
