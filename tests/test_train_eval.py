"""Tests for target assignment, subsampling, schedule, evaluator, and the
CLI prepare task."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.train import targets as T
from deepemia_tpu.train.evaluator import APAccumulator, evaluate_predictions
from deepemia_tpu.train.trainer import auto_max_iter, warmup_multistep_schedule


def test_match_anchors_thresholds():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 11], [50, 50, 60, 60], [0, 0, 100, 100]],
        jnp.float32,
    )
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gt_valid = jnp.asarray([True])
    m = T.match_anchors(anchors, gt, gt_valid)
    labels = np.asarray(m.labels)
    assert labels[0] == 1  # IoU 1.0
    assert labels[2] == 0  # IoU 0
    # anchor 3: IoU = 100/10000 = 0.01 -> negative
    assert labels[3] == 0


def test_match_anchors_low_quality():
    # no anchor reaches 0.7, but each GT's best anchor must be positive
    anchors = jnp.asarray([[0, 0, 20, 20], [40, 40, 60, 60]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)  # best IoU = 0.25
    m = T.match_anchors(anchors, gt, jnp.asarray([True]))
    assert np.asarray(m.labels)[0] == 1
    # with no valid GT everything is background
    m2 = T.match_anchors(anchors, gt, jnp.asarray([False]))
    assert (np.asarray(m2.labels) == 0).all()


def test_subsample_static_layout():
    labels = jnp.asarray([1, 1, 0, 0, 0, 0, -1, -1])
    s = T.subsample(labels, jax.random.PRNGKey(0), num_samples=4, pos_fraction=0.5)
    assert s.idx.shape == (4,)
    idx = np.asarray(s.idx)
    is_pos = np.asarray(s.is_pos)
    valid = np.asarray(s.valid)
    # two positive slots hold the two positives
    assert set(idx[:2][valid[:2]].tolist()) <= {0, 1}
    assert is_pos[:2].all() and not is_pos[2:].any()
    # negative slots hold only label-0 rows
    assert all(labels[j] == 0 for j in idx[2:][valid[2:]])
    # scarce positives -> invalid pos slots
    s2 = T.subsample(
        jnp.asarray([0, 0, 0, 0]), jax.random.PRNGKey(1), 4, 0.5
    )
    assert not np.asarray(s2.valid)[:2].any()


def test_warmup_multistep_schedule():
    sched = warmup_multistep_schedule(1.0, 100, warmup_iters=10, gamma=0.1)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(59)) == pytest.approx(1.0)
    assert float(sched(60)) == pytest.approx(0.1)
    assert float(sched(80)) == pytest.approx(0.01)
    assert auto_max_iter(50) == 10000
    assert auto_max_iter(200) == 20000
    assert auto_max_iter(1) == 1000


def test_evaluator_perfect_predictions():
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    gt_classes = np.array([0, 1], np.int32)
    per_image = [
        {
            "pred_boxes": gt_boxes.copy(),
            "pred_scores": np.array([0.9, 0.8], np.float32),
            "pred_classes": gt_classes.copy(),
            "pred_masks": None,
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_masks": None,
        }
    ]
    m = evaluate_predictions(per_image, 2)
    assert m["bbox/AP"] == pytest.approx(100.0)
    assert m["bbox/AP50"] == pytest.approx(100.0)


def test_evaluator_false_positive_hurts():
    gt_boxes = np.array([[0, 0, 10, 10]], np.float32)
    per_image = [
        {
            "pred_boxes": np.array(
                [[100, 100, 110, 110], [0, 0, 10, 10]], np.float32
            ),
            "pred_scores": np.array([0.95, 0.9], np.float32),  # FP scored higher
            "pred_classes": np.array([0, 0], np.int32),
            "pred_masks": None,
            "gt_boxes": gt_boxes,
            "gt_classes": np.array([0], np.int32),
            "gt_masks": None,
        }
    ]
    m = evaluate_predictions(per_image, 1)
    assert 0 < m["bbox/AP"] < 100.0


def test_evaluator_segm_uses_masks():
    h = w = 32
    gm = np.zeros((1, h, w), bool)
    gm[0, 4:12, 4:12] = True
    pm_good = gm.copy()
    pm_bad = np.zeros_like(gm)
    pm_bad[0, 20:28, 20:28] = True
    base = {
        "pred_scores": np.array([0.9], np.float32),
        "pred_classes": np.array([0], np.int32),
        "gt_boxes": np.array([[4, 4, 12, 12]], np.float32),
        "gt_classes": np.array([0], np.int32),
        "gt_masks": gm,
    }
    good = dict(base, pred_boxes=np.array([[4, 4, 12, 12]], np.float32), pred_masks=pm_good)
    bad = dict(base, pred_boxes=np.array([[20, 20, 28, 28]], np.float32), pred_masks=pm_bad)
    m_good = evaluate_predictions([good], 1)
    m_bad = evaluate_predictions([bad], 1)
    assert m_good["segm/AP"] == pytest.approx(100.0)
    assert m_bad["segm/AP"] == pytest.approx(0.0)


def test_cli_help_and_missing_dataset(tmp_home):
    env = dict(os.environ, DEEPEMIA_TPU_HOME=str(tmp_home), JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "main.py", "--help"],
        capture_output=True,
        text=True,
        cwd=Path(__file__).parent.parent,
        env=env,
    )
    assert out.returncode == 0
    assert "--task" in out.stdout and "inference" in out.stdout
    assert "--quantized" in out.stdout  # int8 serving reachable from the CLI
    # missing dataset name for a task that needs one
    out2 = subprocess.run(
        [sys.executable, "main.py", "--task", "prepare", "--no-gpu-check"],
        capture_output=True,
        text=True,
        cwd=Path(__file__).parent.parent,
        env=env,
    )
    assert out2.returncode == 2
    assert "--dataset_name" in out2.stderr


def test_cli_prepare_task(tmp_home, tmp_path):
    """End-to-end prepare: split file written deterministically."""
    env = dict(os.environ, DEEPEMIA_TPU_HOME=str(tmp_home), JAX_PLATFORMS="cpu")
    # materialize default config + dataset_info + label files
    from deepemia_tpu.config import get_config

    cfg = get_config()
    labels = tmp_path / "labels"
    labels.mkdir()
    for i in range(10):
        (labels / f"im{i}.json").write_text("{}")
    Path(os.path.expanduser(cfg["paths"]["category_json"])).write_text(
        json.dumps({"demo": [str(labels), str(labels), ["a", "b"]]})
    )
    out = subprocess.run(
        [
            sys.executable,
            "main.py",
            "--task",
            "prepare",
            "--dataset_name",
            "demo",
            "--no-gpu-check",
            "--no-download",
        ],
        capture_output=True,
        text=True,
        cwd=Path(__file__).parent.parent,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    split = Path(os.path.expanduser(cfg["paths"]["split_dir"])) / "demo_split.json"
    assert split.exists()
    data = json.loads(split.read_text())
    assert len(data["train"]) == 8 and len(data["test"]) == 2


def test_hpo_successive_halving_schedule(tmp_home, monkeypatch, tmp_path):
    """Halving strategy: every candidate runs a short rung, the top third
    resume (resume=True) to the full budget, the winner is a survivor's
    full-budget AP, and trial dirs are cleaned up."""
    import deepemia_tpu.train.workflow as wf

    calls = []
    # deterministic AP: trial index decides quality; full-budget runs score
    # higher than rung-0 runs so the promotion visibly matters
    state = {"trial_of_ckpt": {}}

    def fake_train(records, nc, out_dir, cfg, max_steps_override=None,
                   resume=True):
        trial = int(out_dir.rsplit("_t", 1)[1])
        calls.append((trial, max_steps_override, resume))
        ckpt = f"{out_dir}/ckpt"
        state["trial_of_ckpt"][ckpt] = trial
        import os as _os

        _os.makedirs(out_dir, exist_ok=True)
        return ckpt, {"total": 1.0}

    def fake_eval(dataset_name, split_dir, rcnn=50, config=None,
                  checkpoint=None, visualize=True, **kw):
        trial = state["trial_of_ckpt"][checkpoint]
        steps = [c[1] for c in calls if c[0] == trial][-1]
        return {"segm/AP": trial + (50.0 if steps == 200 else 0.0)}

    monkeypatch.setattr(wf, "train", fake_train)
    monkeypatch.setattr(wf, "evaluate_model", fake_eval)
    monkeypatch.setattr(wf, "read_dataset_info",
                        lambda p: {"ds": ["/x", "/x", ["a", "b"]]})
    monkeypatch.setattr(wf, "register_datasets",
                        lambda *a, **k: ["a", "b"])
    monkeypatch.setattr(wf, "_registered_records",
                        lambda *a: [{"file_name": "x", "annotations": [1]}])

    from deepemia_tpu.config import get_config

    best = wf.optimize_hyperparameters(
        "ds", str(tmp_path), backbone="R50", n_trials=6,
        config=get_config(), max_steps_override=200, strategy="halving",
    )
    rung0 = [c for c in calls if c[1] == 50]
    rung1 = [c for c in calls if c[1] == 200]
    assert len(rung0) == 6 and all(not c[2] for c in rung0)
    assert len(rung1) == 2 and all(c[2] for c in rung1)  # top third resumed
    # rung-0 AP ranks by trial index -> survivors are trials 4 and 5
    assert sorted(c[0] for c in rung1) == [4, 5]
    assert best["value"] == 55.0  # trial 5 at full budget
    # cleanup ran
    import glob

    assert not glob.glob(str(tmp_path / "ds" / "hpo_r50_t*"))


def test_hpo_halving_tiny_budget_falls_back(tmp_home, monkeypatch, tmp_path):
    """A budget smaller than the minimum rung (50) cannot support two rungs:
    rung0 would exceed the full budget and the promotion would no-op-resume
    past the end — halving must fall back to plain full-budget trials."""
    import deepemia_tpu.train.workflow as wf

    calls = []

    def fake_train(records, nc, out_dir, cfg, max_steps_override=None,
                   resume=True):
        calls.append((max_steps_override, resume))
        return f"{out_dir}/ckpt", {"total": 1.0}

    monkeypatch.setattr(wf, "train", fake_train)
    monkeypatch.setattr(wf, "evaluate_model",
                        lambda *a, **k: {"segm/AP": 1.0})
    monkeypatch.setattr(wf, "read_dataset_info",
                        lambda p: {"ds": ["/x", "/x", ["a", "b"]]})
    monkeypatch.setattr(wf, "register_datasets", lambda *a, **k: ["a", "b"])
    monkeypatch.setattr(wf, "_registered_records",
                        lambda *a: [{"file_name": "x", "annotations": [1]}])

    from deepemia_tpu.config import get_config

    wf.optimize_hyperparameters(
        "ds", str(tmp_path), backbone="R50", n_trials=3,
        config=get_config(), max_steps_override=40, strategy="halving",
    )
    # every trial ran the full 40-step budget from scratch, no 50-step rung
    assert calls == [(40, False)] * 3


def test_hpo_random_strategy_unchanged(tmp_home, monkeypatch, tmp_path):
    import deepemia_tpu.train.workflow as wf

    calls = []

    def fake_train(records, nc, out_dir, cfg, max_steps_override=None,
                   resume=True):
        calls.append((max_steps_override, resume))
        return f"{out_dir}/ckpt", {"total": 1.0}

    monkeypatch.setattr(wf, "train", fake_train)
    monkeypatch.setattr(wf, "evaluate_model",
                        lambda *a, **k: {"segm/AP": 1.0})
    monkeypatch.setattr(wf, "read_dataset_info",
                        lambda p: {"ds": ["/x", "/x", ["a", "b"]]})
    monkeypatch.setattr(wf, "register_datasets", lambda *a, **k: ["a", "b"])
    monkeypatch.setattr(wf, "_registered_records",
                        lambda *a: [{"file_name": "x", "annotations": [1]}])
    from deepemia_tpu.config import get_config

    wf.optimize_hyperparameters(
        "ds", str(tmp_path), backbone="R50", n_trials=3,
        config=get_config(), max_steps_override=100, strategy="random",
    )
    assert calls == [(100, False)] * 3


def test_zero_residual_norms_transform():
    """From-scratch conditioning: every bottleneck norm3 scale zeroed, the
    stem norm rescaled ~1/120, everything else untouched."""
    import jax.numpy as jnp

    from deepemia_tpu.models.mask_rcnn import build_model, init_params
    from deepemia_tpu.train.trainer import zero_residual_norms

    model = build_model("R50", num_classes=2, use_bf16=False)
    params = init_params(model, (64, 64), seed=0)
    out = zero_residual_norms(params)
    bb = out["params"]["backbone"]
    assert float(jnp.abs(bb["res2_block0"]["norm3"]["scale"]).max()) == 0.0
    assert float(jnp.abs(bb["res5_block2"]["norm3"]["scale"]).max()) == 0.0
    # norm1/norm2 untouched
    orig = params["params"]["backbone"]
    np.testing.assert_array_equal(
        np.asarray(bb["res2_block0"]["norm1"]["scale"]),
        np.asarray(orig["res2_block0"]["norm1"]["scale"]),
    )
    np.testing.assert_allclose(
        np.asarray(bb["stem_norm"]["scale"]),
        np.asarray(orig["stem_norm"]["scale"]) / 120.0,
        rtol=1e-6,
    )
    # heads untouched
    np.testing.assert_array_equal(
        np.asarray(out["params"]["rpn_head"]["conv"]["kernel"]),
        np.asarray(params["params"]["rpn_head"]["conv"]["kernel"]),
    )


def test_optimizer_freeze_only_with_pretrained(monkeypatch, tmp_path):
    """train() freezes FREEZE_AT/BN layers only when fine-tuning; from
    random init everything trains (frozen zero gammas would stay dead)."""
    import deepemia_tpu.train.trainer as tr

    captured = {}
    real = tr.make_optimizer

    def spy(*args, **kw):
        captured["params_mask"] = kw.get("params")
        return real(*args, **kw)

    monkeypatch.setattr(tr, "make_optimizer", spy)

    # from scratch: abort right after optimizer creation via a stub loader
    class Boom(Exception):
        pass

    def boom(*a, **k):
        raise Boom()

    monkeypatch.setattr(tr, "make_mesh", boom)
    import pytest as _pytest

    with _pytest.raises(Boom):
        tr.train([{"file_name": "x", "annotations": [1]}], 2,
                 str(tmp_path / "a"), tr.TrainConfig(use_bf16=False,
                 train_size=64), max_steps_override=1)
    assert captured["params_mask"] is None  # nothing frozen

    # fine-tune: freezing mask passed
    import pickle

    from tests.test_weights import _scaled_d2_sd

    sd = _scaled_d2_sd(50, 2, np.random.default_rng(0))
    pkl = tmp_path / "zoo.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"model": sd}, f)
    with _pytest.raises(Boom):
        tr.train([{"file_name": "x", "annotations": [1]}], 2,
                 str(tmp_path / "b"), tr.TrainConfig(use_bf16=False,
                 train_size=64, init_checkpoint=str(pkl)),
                 max_steps_override=1)
    assert captured["params_mask"] is not None  # FREEZE_AT mask active
