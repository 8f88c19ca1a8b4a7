"""Full-detector parity oracle (VERDICT r2 next #2): the Flax chain's
detections — proposals, per-class NMS, score cascade, pasted masks — must
match a dynamic torch/numpy Detectron2-semantics oracle detection for
detection on a genuinely-trained model, and land within 1 AP point of it
against a common ground truth (BASELINE.md "mask AP within 1%" target,
reference surface src/data/models.py:134-160)."""

import numpy as np
import pytest


def test_parity_model_cache_dir(monkeypatch, tmp_path):
    """The harness's trained detector lives in a persistent, parameter-keyed
    cache so warm reruns of the slow parity test skip the ~30 min train."""
    from tests.parity_harness import parity_model_dir

    monkeypatch.delenv("DEEPEMIA_TPU_PARITY_MODEL_CACHE", raising=False)
    d = parity_model_dir(str(tmp_path), 50, 300)
    assert d.endswith("blob_r50_s300_v1") and ".cache" in d

    monkeypatch.setenv("DEEPEMIA_TPU_PARITY_MODEL_CACHE", str(tmp_path / "c"))
    assert parity_model_dir(str(tmp_path), 101, 400) == str(
        tmp_path / "c" / "blob_r101_s400_v1"
    )

    monkeypatch.setenv("DEEPEMIA_TPU_PARITY_MODEL_CACHE", "0")
    assert parity_model_dir(str(tmp_path), 50, 300) == str(tmp_path / "model")


@pytest.mark.slow
@pytest.mark.heavy
def test_full_detector_parity(tmp_path):
    from tests.parity_harness import run_parity

    report = run_parity(str(tmp_path), train_steps=300, n_test=10)

    # the model must actually detect (a 0-detection parity pass is vacuous)
    total_dets = sum(m["n_a"] for m in report["matches"])
    assert total_dets >= 10, f"detector too weak: {total_dets} detections"

    rates = [m["match_rate"] for m in report["matches"]]
    overall = float(np.mean(rates))
    assert overall >= 0.9, (overall, report["matches"])

    # matched detections agree in score and mask
    score_ok = float(np.mean([m["score_ok_rate"] for m in report["matches"]]))
    mask_ok = float(np.mean([m["mask_ok_rate"] for m in report["matches"]]))
    assert score_ok >= 0.9, report["matches"]
    assert mask_ok >= 0.9, report["matches"]

    assert report["delta_bbox_ap"] < 1.0, (
        report["ap_flax"]["bbox/AP"], report["ap_oracle"]["bbox/AP"]
    )
    assert report["delta_segm_ap"] < 1.0, (
        report["ap_flax"].get("segm/AP"), report["ap_oracle"].get("segm/AP")
    )
