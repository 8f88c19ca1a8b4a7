"""Pretrained/zoo initialization (VERDICT r2 missing #1).

The reference always fine-tunes from COCO model-zoo weights
(``cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(...)``,
reference src/functions/train_model.py:128-134). These tests cover the
TPU-native equivalent:

  * an 81-class zoo-named full-model checkpoint overlays onto a 2-class
    model — trunk/FPN/RPN/box-head loaded, class-count-dependent heads
    re-initialized;
  * Caffe2-era backbone pickles (MSRA R-50.pkl naming) remap and load;
  * export -> convert round-trips exactly;
  * fine-tuning from a pretrained checkpoint starts at a much lower loss
    than random init (A/B smoke, slow).
"""

import pickle

import numpy as np
import pytest

from deepemia_tpu.models.mask_rcnn import build_model, init_params
from deepemia_tpu.models.weights import (
    convert_detectron2_state_dict,
    convert_partial_state_dict,
    export_detectron2_state_dict,
    is_caffe2_names,
    load_pretrained_params,
    overlay_params,
    remap_caffe2_names,
)
from tests.test_weights import _scaled_d2_sd

HEAD_PATHS = (
    "roi_heads/box_predictor/cls_score/kernel",
    "roi_heads/box_predictor/cls_score/bias",
    "roi_heads/box_predictor/bbox_pred/kernel",
    "roi_heads/box_predictor/bbox_pred/bias",
    "roi_heads/mask_head/predictor/kernel",
    "roi_heads/mask_head/predictor/bias",
)


def _write_pkl(sd, path):
    with open(path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)


@pytest.fixture(scope="module")
def zoo_sd():
    rng = np.random.default_rng(7)
    return _scaled_d2_sd(50, 80, rng)  # COCO-style 80-class checkpoint


def test_zoo_head_mismatch_overlay(zoo_sd, tmp_path):
    """81-class zoo checkpoint -> 2-class model: trunk loaded exactly,
    heads stay at fresh init (matching Detectron2's shape-mismatch skip)."""
    path = tmp_path / "zoo.pkl"
    _write_pkl(zoo_sd, path)
    model = build_model("R50", num_classes=2, use_bf16=False)
    params, info = load_pretrained_params(str(path), model, 2, init_hw=(64, 64))

    assert set(info["sections"]) == {
        "backbone", "fpn", "rpn_head", "box_head", "box_predictor", "mask_head"
    }
    skipped_paths = {s[0] for s in info["skipped"]}
    assert skipped_paths == set(HEAD_PATHS), skipped_paths

    p = params["params"]
    # trunk weight actually equals the converted checkpoint tensor
    want_stem = np.transpose(zoo_sd["backbone.bottom_up.stem.conv1.weight"],
                             (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["stem_conv"]["kernel"]), want_stem, rtol=1e-6
    )
    # box-head fc weights load too (class-independent)
    np.testing.assert_allclose(
        np.asarray(p["roi_heads"]["box_head"]["fc1"]["kernel"]),
        zoo_sd["roi_heads.box_head.fc1.weight"].T,
        rtol=1e-6,
    )
    # heads sized for the TARGET classes, not the checkpoint's
    assert p["roi_heads"]["box_predictor"]["cls_score"]["kernel"].shape == (1024, 3)
    assert p["roi_heads"]["box_predictor"]["bbox_pred"]["kernel"].shape == (1024, 8)
    assert p["roi_heads"]["mask_head"]["predictor"]["kernel"].shape[-1] == 2
    # and they are NOT the checkpoint values (fresh init)
    assert not np.allclose(
        np.asarray(p["roi_heads"]["box_predictor"]["cls_score"]["bias"]),
        zoo_sd["roi_heads.box_predictor.cls_score.bias"][:3],
    )


def test_zoo_matching_classes_loads_everything(zoo_sd, tmp_path):
    path = tmp_path / "zoo.pkl"
    _write_pkl(zoo_sd, path)
    model = build_model("R50", num_classes=80, use_bf16=False)
    params, info = load_pretrained_params(str(path), model, 80, init_hw=(64, 64))
    assert info["skipped"] == []
    full = convert_detectron2_state_dict(zoo_sd, 50)["params"]
    n_leaves = len(
        [1 for _ in _iter_leaves(full)]
    )
    assert info["used"] == n_leaves
    np.testing.assert_allclose(
        np.asarray(params["params"]["roi_heads"]["box_predictor"]["cls_score"]["bias"]),
        zoo_sd["roi_heads.box_predictor.cls_score.bias"],
        rtol=1e-6,
    )


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


def _d2_backbone_to_caffe2(sd):
    """Rename the backbone subset of a D2-named sd into Caffe2 MSRA naming,
    folding BN running stats into affine s/b (as real R-50.pkl files ship)."""
    import re

    eps = 1e-5
    out = {}
    folded = {}
    for k, v in sd.items():
        if not k.startswith("backbone.bottom_up."):
            continue
        folded[k] = v
    for k, v in list(folded.items()):
        if k.endswith(".norm.weight"):
            base = k[: -len(".weight")]
            w = folded[f"{base}.weight"]
            b = folded[f"{base}.bias"]
            mean = folded[f"{base}.running_mean"]
            var = folded[f"{base}.running_var"]
            s = w / np.sqrt(var + eps)
            folded[f"{base}.weight"] = s
            folded[f"{base}.bias"] = b - mean * s
    for k, v in folded.items():
        r = k[len("backbone.bottom_up."):]
        if r == "stem.conv1.weight":
            out["conv1_w"] = v
        elif r == "stem.conv1.norm.weight":
            out["res_conv1_bn_s"] = v
        elif r == "stem.conv1.norm.bias":
            out["res_conv1_bn_b"] = v
        elif m := re.match(r"res(\d+)\.(\d+)\.conv([123])\.weight$", r):
            s_, b_, i = m.groups()
            br = {1: "a", 2: "b", 3: "c"}[int(i)]
            out[f"res{s_}_{b_}_branch2{br}_w"] = v
        elif m := re.match(r"res(\d+)\.(\d+)\.conv([123])\.norm\.(weight|bias)$", r):
            s_, b_, i, wb = m.groups()
            br = {1: "a", 2: "b", 3: "c"}[int(i)]
            out[f"res{s_}_{b_}_branch2{br}_bn_{'s' if wb == 'weight' else 'b'}"] = v
        elif m := re.match(r"res(\d+)\.(\d+)\.shortcut\.weight$", r):
            s_, b_ = m.groups()
            out[f"res{s_}_{b_}_branch1_w"] = v
        elif m := re.match(r"res(\d+)\.(\d+)\.shortcut\.norm\.(weight|bias)$", r):
            s_, b_, wb = m.groups()
            out[f"res{s_}_{b_}_branch1_bn_{'s' if wb == 'weight' else 'b'}"] = v
    out["fc1000_w"] = np.zeros((1000, 2048), np.float32)  # classifier: dropped
    out["fc1000_b"] = np.zeros((1000,), np.float32)
    return out


def test_caffe2_backbone_remap_and_overlay(zoo_sd, tmp_path):
    c2 = _d2_backbone_to_caffe2(zoo_sd)
    assert is_caffe2_names(c2)
    remapped = remap_caffe2_names(c2)
    assert "fc1000_w" not in " ".join(remapped)  # classifier dropped
    # affine-only norms: no running stats in the remapped dict
    assert not any(k.endswith("running_mean") for k in remapped)

    path = tmp_path / "R-50.pkl"
    _write_pkl(c2, path)
    model = build_model("R50", num_classes=2, use_bf16=False)
    params, info = load_pretrained_params(str(path), model, 2, init_hw=(64, 64))
    assert info["sections"] == ["backbone"]  # nothing else in the pickle
    p = params["params"]
    want_stem = np.transpose(c2["conv1_w"], (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["stem_conv"]["kernel"]), want_stem, rtol=1e-6
    )
    # folded norm values flowed through
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["stem_norm"]["scale"]),
        c2["res_conv1_bn_s"],
        rtol=1e-6,
    )


def test_export_convert_roundtrip():
    model = build_model("R50", num_classes=3, use_bf16=False)
    params = init_params(model, (64, 64), seed=3)
    params = {"params": {k: v for k, v in params["params"].items()}}
    sd = export_detectron2_state_dict(params, 50)
    back = convert_detectron2_state_dict(sd, 50)["params"]
    orig = params["params"]
    flat_b = dict(_flatten(back))
    flat_o = dict(_flatten(orig))
    assert set(flat_b) == set(flat_o)
    for k in flat_o:
        np.testing.assert_allclose(
            flat_b[k], np.asarray(flat_o[k], np.float32), rtol=1e-6, err_msg=k
        )


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), np.asarray(v, np.float32)


def test_overlay_reports_missing_target_path():
    target = {"a": {"x": np.zeros((2, 2))}}
    conv = {"a": {"x": np.ones((2, 2)), "y": np.ones(3)}, "b": {"z": np.ones(1)}}
    merged, used, skipped = overlay_params(target, conv)
    assert used == 1
    assert np.all(merged["a"]["x"] == 1)
    assert {s[0] for s in skipped} == {"a/y", "b"}


@pytest.mark.slow
@pytest.mark.heavy
def test_finetune_starts_below_random_init(tmp_path):
    """A/B smoke (VERDICT r2 next #1 'Done' criterion): one step from
    pretrained weights yields a much lower loss than one step from random
    init at equal settings."""
    import cv2

    from deepemia_tpu.data.models import load_model
    from deepemia_tpu.train.trainer import TrainConfig, train

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(1)
    records = []
    for i in range(4):
        im = np.full((96, 96, 3), 40, np.uint8)
        annos = []
        for j in range(2):
            cx, cy, r = (
                int(rng.integers(20, 76)),
                int(rng.integers(20, 76)),
                int(rng.integers(8, 13)),
            )
            cv2.circle(im, (cx, cy), r, (210, 210, 210), -1)
            t = np.linspace(0, 2 * np.pi, 16, endpoint=False)
            poly = []
            for a in t:
                poly.extend([float(cx + r * np.cos(a)), float(cy + r * np.sin(a))])
            annos.append(
                {
                    "bbox": [cx - r, cy - r, cx + r, cy + r],
                    "bbox_mode": "XYXY_ABS",
                    "segmentation": [poly],
                    "category_id": j % 2,
                }
            )
        p = imgs / f"im{i}.png"
        cv2.imwrite(str(p), im)
        records.append(
            {
                "file_name": str(p),
                "image_id": i,
                "height": 96,
                "width": 96,
                "annotations": annos,
            }
        )

    caps = dict(
        pre_nms_topk=128, post_nms_topk=64, rpn_batch=64, roi_batch=64,
        mask_rois=16,
    )

    def cfg(init_ckpt=None):
        return TrainConfig(
            backbone="R50", ims_per_batch=2, train_size=128, max_instances=8,
            base_lr=0.00025, checkpoint_every=1000, log_every=100,
            use_bf16=False, warmup_iters=10, loss_caps=caps,
            grad_clip_norm=1.0, init_checkpoint=init_ckpt,
        )

    # phase A: pretrain from scratch, export as a D2-named pickle
    ckpt_a, m_a = train(
        records, 2, str(tmp_path / "a"), cfg(), max_steps_override=60
    )
    assert np.isfinite(m_a["total"]), m_a
    _, params_a = load_model(ckpt_a, num_classes=2, use_bf16=False)
    from deepemia_tpu.models.weights import export_detectron2_state_dict

    sd = export_detectron2_state_dict(params_a, 50)
    pkl = tmp_path / "pretrained.pkl"
    _write_pkl(sd, pkl)

    # phase B/C: ONE step fine-tuned vs ONE step random-init
    _, m_ft = train(
        records, 2, str(tmp_path / "b"), cfg(str(pkl)), max_steps_override=1
    )
    _, m_rand = train(
        records, 2, str(tmp_path / "c"), cfg(), max_steps_override=1
    )
    assert m_ft["total"] < 0.85 * m_rand["total"], (m_ft, m_rand)
    # continuity: one fine-tuned step starts near where pretraining ended
    assert m_ft["total"] < m_a["total"] * 1.5, (m_ft, m_a)
