"""Detectron2 checkpoint -> Flax parameter conversion.

The parity lever (SURVEY.md §7 step 3): the reference's trained models are
Detectron2 ``model_final_r{50,101}.pth`` files (train_model.py:230-238,
discovered by models.py:33-51); converting them exactly makes inference
parity a numerics problem instead of a retraining problem.

Conventions handled:
  * torch Conv2d [O,I,kh,kw]  -> flax Conv kernel [kh,kw,I,O]
  * torch Linear [O,I]        -> flax Dense kernel [I,O]
  * torch ConvTranspose2d [I,O,kh,kw] -> flax ConvTranspose [kh,kw,I,O]
    (per-layer orientation verified in tests/test_models.py; composed
    stage-by-stage torch parity in tests/test_weights.py)
  * FrozenBatchNorm2d (weight,bias,running_mean,running_var) folded into the
    affine FrozenBatchNorm: scale = w/sqrt(var+eps), bias = b - mean*scale
  * box-head fc input ordering: Detectron2 flattens NCHW; BoxHead transposes
    pooled NHWC features to NCHW before flattening so fc weights map 1:1.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Tuple

import numpy as np

from deepemia_tpu.utils.exceptions import ModelLoadError

log = logging.getLogger("deepemia_tpu.weights")

BN_EPS = 1e-5  # FrozenBatchNorm2d default


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _deconv(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d [I,O,kh,kw] -> Deconv2x2 kernel [kh,kw,I,O]
    return np.transpose(w, (2, 3, 0, 1))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]
    b = sd[f"{prefix}.bias"]
    mean = sd.get(f"{prefix}.running_mean")
    var = sd.get(f"{prefix}.running_var")
    if mean is None:  # already-affine checkpoint
        return {"scale": w, "bias": b}
    scale = w / np.sqrt(var + BN_EPS)
    return {"scale": scale, "bias": b - mean * scale}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a Detectron2 checkpoint into {name: np.ndarray}.

    Supports both ``.pth`` (torch.save from DefaultTrainer — the reference's
    trained checkpoints, train_model.py:230-238) and zoo ``.pkl`` files
    (pickled {'model': {name: ndarray}, '__author__': 'Detectron2 Model
    Zoo'} with the same parameter names). Caffe2-era backbone pickles
    (R-50.pkl with branch2a-style names) are not supported.
    """
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f, encoding="latin1")
        sd = obj.get("model", obj) if isinstance(obj, dict) else obj
        return {
            k: np.asarray(v)
            for k, v in sd.items()
            if isinstance(v, np.ndarray)
        }
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
    return out


def convert_detectron2_state_dict(
    sd: Dict[str, np.ndarray], depth: int = 50
) -> Dict[str, Any]:
    """Map a Detectron2 Mask R-CNN R{depth}-FPN state dict onto the
    ``MaskRCNN`` Flax parameter tree. Returns {'params': {...}}."""
    from deepemia_tpu.models.resnet import STAGE_BLOCKS

    p: Dict[str, Any] = {}

    def put(path: Tuple[str, ...], value: np.ndarray):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, np.float32)

    bu = "backbone.bottom_up"
    put(("backbone", "stem_conv", "kernel"), _conv(sd[f"{bu}.stem.conv1.weight"]))
    bn = _fold_bn(sd, f"{bu}.stem.conv1.norm")
    put(("backbone", "stem_norm", "scale"), bn["scale"])
    put(("backbone", "stem_norm", "bias"), bn["bias"])

    for stage_idx, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        s = stage_idx + 2
        for b in range(n_blocks):
            d2 = f"{bu}.res{s}.{b}"
            fx = ("backbone", f"res{s}_block{b}")
            for i in (1, 2, 3):
                put((*fx, f"conv{i}", "kernel"), _conv(sd[f"{d2}.conv{i}.weight"]))
                bn = _fold_bn(sd, f"{d2}.conv{i}.norm")
                put((*fx, f"norm{i}", "scale"), bn["scale"])
                put((*fx, f"norm{i}", "bias"), bn["bias"])
            if f"{d2}.shortcut.weight" in sd:
                put((*fx, "shortcut", "kernel"), _conv(sd[f"{d2}.shortcut.weight"]))
                bn = _fold_bn(sd, f"{d2}.shortcut.norm")
                put((*fx, "shortcut_norm", "scale"), bn["scale"])
                put((*fx, "shortcut_norm", "bias"), bn["bias"])

    for lvl in (2, 3, 4, 5):
        put(
            ("fpn", f"lateral_res{lvl}", "kernel"),
            _conv(sd[f"backbone.fpn_lateral{lvl}.weight"]),
        )
        put(
            ("fpn", f"lateral_res{lvl}", "bias"),
            sd[f"backbone.fpn_lateral{lvl}.bias"],
        )
        put(
            ("fpn", f"output_p{lvl}", "kernel"),
            _conv(sd[f"backbone.fpn_output{lvl}.weight"]),
        )
        put(("fpn", f"output_p{lvl}", "bias"), sd[f"backbone.fpn_output{lvl}.bias"])

    rh = "proposal_generator.rpn_head"
    put(("rpn_head", "conv", "kernel"), _conv(sd[f"{rh}.conv.weight"]))
    put(("rpn_head", "conv", "bias"), sd[f"{rh}.conv.bias"])
    put(
        ("rpn_head", "objectness", "kernel"),
        _conv(sd[f"{rh}.objectness_logits.weight"]),
    )
    put(("rpn_head", "objectness", "bias"), sd[f"{rh}.objectness_logits.bias"])
    put(
        ("rpn_head", "anchor_deltas", "kernel"),
        _conv(sd[f"{rh}.anchor_deltas.weight"]),
    )
    put(("rpn_head", "anchor_deltas", "bias"), sd[f"{rh}.anchor_deltas.bias"])

    bh = "roi_heads.box_head"
    for fc in ("fc1", "fc2"):
        put(
            ("roi_heads", "box_head", fc, "kernel"), _dense(sd[f"{bh}.{fc}.weight"])
        )
        put(("roi_heads", "box_head", fc, "bias"), sd[f"{bh}.{fc}.bias"])

    bp = "roi_heads.box_predictor"
    put(
        ("roi_heads", "box_predictor", "cls_score", "kernel"),
        _dense(sd[f"{bp}.cls_score.weight"]),
    )
    put(("roi_heads", "box_predictor", "cls_score", "bias"), sd[f"{bp}.cls_score.bias"])
    put(
        ("roi_heads", "box_predictor", "bbox_pred", "kernel"),
        _dense(sd[f"{bp}.bbox_pred.weight"]),
    )
    put(("roi_heads", "box_predictor", "bbox_pred", "bias"), sd[f"{bp}.bbox_pred.bias"])

    mh = "roi_heads.mask_head"
    for i in (1, 2, 3, 4):
        put(
            ("roi_heads", "mask_head", f"mask_fcn{i}", "kernel"),
            _conv(sd[f"{mh}.mask_fcn{i}.weight"]),
        )
        put(
            ("roi_heads", "mask_head", f"mask_fcn{i}", "bias"),
            sd[f"{mh}.mask_fcn{i}.bias"],
        )
    put(("roi_heads", "mask_head", "deconv", "kernel"), _deconv(sd[f"{mh}.deconv.weight"]))
    put(("roi_heads", "mask_head", "deconv", "bias"), sd[f"{mh}.deconv.bias"])
    put(
        ("roi_heads", "mask_head", "predictor", "kernel"),
        _conv(sd[f"{mh}.predictor.weight"]),
    )
    put(("roi_heads", "mask_head", "predictor", "bias"), sd[f"{mh}.predictor.bias"])

    return {"params": p}


def infer_num_classes(sd: Dict[str, np.ndarray]) -> int:
    """Detectron2 cls_score rows = num_classes + 1 (bg)."""
    w = sd.get("roi_heads.box_predictor.cls_score.weight")
    if w is None:
        raise ModelLoadError("cls_score.weight missing from checkpoint")
    return int(w.shape[0]) - 1


def infer_depth(sd: Dict[str, np.ndarray]) -> int:
    """R50 vs R101 from the res4 block count (reference auto-detects by
    filename suffix, models.py:33-51; we also sniff the weights)."""
    blocks = {
        int(m.group(1))
        for k in sd
        if (m := re.match(r"backbone\.bottom_up\.res4\.(\d+)\.conv1\.weight", k))
    }
    if not blocks:
        raise ModelLoadError("no res4 blocks found in checkpoint")
    return 101 if max(blocks) + 1 == 23 else 50


def load_detectron2_checkpoint(path: str):
    """One-call load: returns (flax_params, num_classes, depth)."""
    sd = load_torch_state_dict(path)
    depth = infer_depth(sd)
    num_classes = infer_num_classes(sd)
    params = convert_detectron2_state_dict(sd, depth)
    log.info(
        "Converted Detectron2 checkpoint %s: R%d, %d classes", path, depth, num_classes
    )
    return params, num_classes, depth
