"""Run the full-detector parity harness and write PARITY.md.

Usage: python tools/run_parity.py [--steps 400] [--n-test 10] [--work DIR]

Trains a small R50 on synthetic blob micrographs, exports the weights to a
Detectron2-named state dict, and compares the statically-shaped Flax chain
against the dynamic torch/numpy oracle (tests/oracle_torch.py) detection
for detection and as bbox/segm AP (BASELINE.md "mask AP within 1%").
Forces the CPU backend so both sides share f32 numerics.
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
_ap.add_argument("--backbone", default="R50", choices=["R50", "R101"])
_ap.add_argument("--n-test", type=int, default=10)
_ap.add_argument("--work", default=None)
_ap.add_argument("--out", default="PARITY.md")
_ap.add_argument(
    "--train-only",
    action="store_true",
    help=(
        "Only train the blob detector (run WITHOUT forcing the CPU backend "
        "so the TPU does the training), then exit; a later run with the "
        "same --work dir loads the checkpoint and compares on CPU"
    ),
)
args = _ap.parse_args()

import jax  # noqa: E402

if not args.train_only:
    # comparisons need f32 CPU numerics on both sides
    jax.config.update("jax_platforms", "cpu")
from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np  # noqa: E402


def main():
    os.environ.setdefault(
        "DEEPEMIA_TPU_HOME", os.path.join(tempfile.mkdtemp(), "home")
    )
    work = args.work or tempfile.mkdtemp(prefix="parity_")
    if args.train_only:
        from tests.parity_harness import (
            make_blob_records,
            parity_model_dir,
            train_blob_detector,
        )

        depth = 101 if "101" in args.backbone else 50
        recs = make_blob_records(os.path.join(work, "train_imgs"), 16, seed=0)
        # train straight into the shared model cache: the slow CPU parity
        # test and later compare-only runs load it from there
        _, _, _, metrics = train_blob_detector(
            recs, parity_model_dir(work, depth, args.steps),
            steps=args.steps, depth=depth,
        )
        print(json.dumps({"trained": args.steps, "metrics": metrics,
                          "work": work}))
        return
    from tests.parity_harness import run_parity

    report = run_parity(
        work, train_steps=args.steps, n_test=args.n_test,
        depth=101 if "101" in args.backbone else 50,
    )

    m = report["matches"]
    rate = float(np.mean([x["match_rate"] for x in m]))
    score_ok = float(np.mean([x["score_ok_rate"] for x in m]))
    mask_ok = float(np.mean([x["mask_ok_rate"] for x in m]))
    mean_iou = float(np.mean([x["mean_mask_iou"] for x in m]))
    n_flax = sum(x["n_a"] for x in m)
    n_oracle = sum(x["n_b"] for x in m)
    af, ao = report["ap_flax"], report["ap_oracle"]

    lines = [
        "# PARITY — full-detector oracle comparison",
        "",
        "The statically-shaped Flax Mask R-CNN chain vs a from-scratch",
        "DYNAMIC torch/numpy re-implementation of Detectron2's inference",
        "semantics (`tests/oracle_torch.py`: anchors, proposal selection,",
        "adaptive-sampling RoIAlign with the CUDA op's boundary rules,",
        "per-class NMS, mask paste), on a genuinely-trained model",
        f"({args.backbone}, {args.steps} steps on synthetic blob micrographs) over",
        f"{args.n_test} held-out images. CPU backend, f32 both sides.",
        "Regenerate: `python tools/run_parity.py`.",
        "",
        "## Detection-for-detection",
        "",
        "| metric | value |",
        "|---|---|",
        f"| Flax detections (score>0.05) | {n_flax} |",
        f"| Oracle detections | {n_oracle} |",
        f"| match rate (IoU>0.85, same class) | {rate:.1%} |",
        f"| matched score agreement (|Δ|≤0.05) | {score_ok:.1%} |",
        f"| matched pasted-mask IoU≥0.8 | {mask_ok:.1%} |",
        f"| mean matched mask IoU | {mean_iou:.3f} |",
        "",
        "## AP against common ground truth (deepemia evaluator)",
        "",
        "| metric | Flax chain | torch oracle | Δ |",
        "|---|---|---|---|",
        f"| bbox/AP | {af['bbox/AP']:.2f} | {ao['bbox/AP']:.2f} | "
        f"{report['delta_bbox_ap']:.2f} |",
        f"| segm/AP | {af.get('segm/AP', float('nan')):.2f} | "
        f"{ao.get('segm/AP', float('nan')):.2f} | "
        f"{report['delta_segm_ap']:.2f} |",
        "",
        f"Target (BASELINE.md): |ΔAP| < 1.0 — "
        f"{'MET' if report['delta_bbox_ap'] < 1 and report['delta_segm_ap'] < 1 else 'NOT MET'}.",
        "",
        "## Per-image match detail",
        "",
        "| img | flax | oracle | matched | mean mask IoU |",
        "|---|---|---|---|---|",
    ]
    for i, x in enumerate(m):
        lines.append(
            f"| {i} | {x['n_a']} | {x['n_b']} | {x['n_match']} | "
            f"{x['mean_mask_iou']:.3f} |"
        )
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(
        {
            "match_rate": rate,
            "delta_bbox_ap": report["delta_bbox_ap"],
            "delta_segm_ap": report["delta_segm_ap"],
            "out": args.out,
        }
    ))


if __name__ == "__main__":
    main()
