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


def _make_put(p: Dict[str, Any]):
    def put(path: Tuple[str, ...], value: np.ndarray):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = np.asarray(value, np.float32)

    return put


def _convert_backbone(sd, put, depth):
    from deepemia_tpu.models.resnet import STAGE_BLOCKS

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


def _convert_fpn(sd, put):
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


def _convert_rpn(sd, put):
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


def _convert_box_head(sd, put):
    bh = "roi_heads.box_head"
    for fc in ("fc1", "fc2"):
        put(
            ("roi_heads", "box_head", fc, "kernel"), _dense(sd[f"{bh}.{fc}.weight"])
        )
        put(("roi_heads", "box_head", fc, "bias"), sd[f"{bh}.{fc}.bias"])


def _convert_box_predictor(sd, put):
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


def _convert_mask_head(sd, put):
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


_SECTIONS = (
    ("backbone", lambda sd, put, depth: _convert_backbone(sd, put, depth)),
    ("fpn", lambda sd, put, depth: _convert_fpn(sd, put)),
    ("rpn_head", lambda sd, put, depth: _convert_rpn(sd, put)),
    ("box_head", lambda sd, put, depth: _convert_box_head(sd, put)),
    ("box_predictor", lambda sd, put, depth: _convert_box_predictor(sd, put)),
    ("mask_head", lambda sd, put, depth: _convert_mask_head(sd, put)),
)


def convert_detectron2_state_dict(
    sd: Dict[str, np.ndarray], depth: int = 50
) -> Dict[str, Any]:
    """Map a Detectron2 Mask R-CNN R{depth}-FPN state dict onto the
    ``MaskRCNN`` Flax parameter tree. Returns {'params': {...}}."""
    p: Dict[str, Any] = {}
    put = _make_put(p)
    for _, fn in _SECTIONS:
        fn(sd, put, depth)
    return {"params": p}


def convert_partial_state_dict(
    sd: Dict[str, np.ndarray], depth: int = 50
) -> Tuple[Dict[str, Any], list]:
    """Tolerant conversion: convert every model section present in ``sd``,
    skipping sections whose keys are absent (backbone-only zoo pickles such
    as the Caffe2 R-50.pkl carry no FPN/RPN/head weights). Returns
    ({'params': ...}, [converted section names])."""
    p: Dict[str, Any] = {}
    converted = []
    for name, fn in _SECTIONS:
        part: Dict[str, Any] = {}
        try:
            fn(sd, _make_put(part), depth)
        except KeyError:
            log.debug("Checkpoint lacks section %r — left at init", name)
            continue
        # merge the completed section in
        stack = [(p, part)]
        while stack:
            dst, src = stack.pop()
            for k, v in src.items():
                if isinstance(v, dict):
                    stack.append((dst.setdefault(k, {}), v))
                else:
                    dst[k] = v
        converted.append(name)
    return {"params": p}, converted


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
    if is_caffe2_names(sd):
        sd = remap_caffe2_names(sd)
    depth = infer_depth(sd)
    num_classes = infer_num_classes(sd)
    params = convert_detectron2_state_dict(sd, depth)
    log.info(
        "Converted Detectron2 checkpoint %s: R%d, %d classes", path, depth, num_classes
    )
    return params, num_classes, depth


def export_detectron2_state_dict(
    params: Dict[str, Any], depth: int = 50
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_detectron2_state_dict`: Flax parameter tree
    -> Detectron2-named {name: ndarray}. Folded norms export as affine
    weight/bias pairs with no running stats (``_fold_bn`` reads those back
    unchanged), so convert(export(p)) == p. Used by the fine-tune A/B tests
    and the torch parity oracle to hand our weights to a torch replica."""
    from deepemia_tpu.models.resnet import STAGE_BLOCKS

    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    def a(x):
        return np.asarray(x, np.float32)

    def inv_conv(w):
        return np.transpose(a(w), (3, 2, 0, 1))

    def inv_deconv(w):
        return np.transpose(a(w), (2, 3, 0, 1))

    def inv_dense(w):
        return np.transpose(a(w), (1, 0))

    bu = "backbone.bottom_up"
    bb = p["backbone"]
    sd[f"{bu}.stem.conv1.weight"] = inv_conv(bb["stem_conv"]["kernel"])
    sd[f"{bu}.stem.conv1.norm.weight"] = a(bb["stem_norm"]["scale"])
    sd[f"{bu}.stem.conv1.norm.bias"] = a(bb["stem_norm"]["bias"])
    for stage_idx, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        s = stage_idx + 2
        for b in range(n_blocks):
            blk = bb[f"res{s}_block{b}"]
            d2 = f"{bu}.res{s}.{b}"
            for i in (1, 2, 3):
                sd[f"{d2}.conv{i}.weight"] = inv_conv(blk[f"conv{i}"]["kernel"])
                sd[f"{d2}.conv{i}.norm.weight"] = a(blk[f"norm{i}"]["scale"])
                sd[f"{d2}.conv{i}.norm.bias"] = a(blk[f"norm{i}"]["bias"])
            if "shortcut" in blk:
                sd[f"{d2}.shortcut.weight"] = inv_conv(blk["shortcut"]["kernel"])
                sd[f"{d2}.shortcut.norm.weight"] = a(blk["shortcut_norm"]["scale"])
                sd[f"{d2}.shortcut.norm.bias"] = a(blk["shortcut_norm"]["bias"])

    fpn = p["fpn"]
    for lvl in (2, 3, 4, 5):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = inv_conv(
            fpn[f"lateral_res{lvl}"]["kernel"]
        )
        sd[f"backbone.fpn_lateral{lvl}.bias"] = a(fpn[f"lateral_res{lvl}"]["bias"])
        sd[f"backbone.fpn_output{lvl}.weight"] = inv_conv(
            fpn[f"output_p{lvl}"]["kernel"]
        )
        sd[f"backbone.fpn_output{lvl}.bias"] = a(fpn[f"output_p{lvl}"]["bias"])

    rh = "proposal_generator.rpn_head"
    rpn = p["rpn_head"]
    sd[f"{rh}.conv.weight"] = inv_conv(rpn["conv"]["kernel"])
    sd[f"{rh}.conv.bias"] = a(rpn["conv"]["bias"])
    sd[f"{rh}.objectness_logits.weight"] = inv_conv(rpn["objectness"]["kernel"])
    sd[f"{rh}.objectness_logits.bias"] = a(rpn["objectness"]["bias"])
    sd[f"{rh}.anchor_deltas.weight"] = inv_conv(rpn["anchor_deltas"]["kernel"])
    sd[f"{rh}.anchor_deltas.bias"] = a(rpn["anchor_deltas"]["bias"])

    roi = p["roi_heads"]
    for fc in ("fc1", "fc2"):
        sd[f"roi_heads.box_head.{fc}.weight"] = inv_dense(
            roi["box_head"][fc]["kernel"]
        )
        sd[f"roi_heads.box_head.{fc}.bias"] = a(roi["box_head"][fc]["bias"])
    for nm in ("cls_score", "bbox_pred"):
        sd[f"roi_heads.box_predictor.{nm}.weight"] = inv_dense(
            roi["box_predictor"][nm]["kernel"]
        )
        sd[f"roi_heads.box_predictor.{nm}.bias"] = a(
            roi["box_predictor"][nm]["bias"]
        )
    mh = roi["mask_head"]
    for i in (1, 2, 3, 4):
        sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = inv_conv(
            mh[f"mask_fcn{i}"]["kernel"]
        )
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = a(mh[f"mask_fcn{i}"]["bias"])
    sd["roi_heads.mask_head.deconv.weight"] = inv_deconv(mh["deconv"]["kernel"])
    sd["roi_heads.mask_head.deconv.bias"] = a(mh["deconv"]["bias"])
    sd["roi_heads.mask_head.predictor.weight"] = inv_conv(mh["predictor"]["kernel"])
    sd["roi_heads.mask_head.predictor.bias"] = a(mh["predictor"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# Pretrained initialization (reference always fine-tunes from zoo weights:
# cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(...),
# src/functions/train_model.py:128-134)
# ---------------------------------------------------------------------------

_C2_KEY = re.compile(r"^(conv1_w|res_conv1_bn_[sb]|res\d+_\d+_branch[12].*)$")


def is_caffe2_names(sd: Dict[str, np.ndarray]) -> bool:
    """True for Caffe2-era ImageNet backbone pickles (MSRA R-50.pkl /
    R-101.pkl: ``conv1_w``, ``res2_0_branch2a_w``, ``..._bn_s`` names)."""
    return any(_C2_KEY.match(k) for k in sd)


def remap_caffe2_names(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename Caffe2 backbone keys to Detectron2 naming (the same pure
    renaming Detectron2 performs in
    ``detectron2/checkpoint/c2_model_loading.py``):

      conv1_w                   -> backbone.bottom_up.stem.conv1.weight
      res_conv1_bn_{s,b}        -> backbone.bottom_up.stem.conv1.norm.{weight,bias}
      resS_B_branch2{a,b,c}_w   -> backbone.bottom_up.resS.B.conv{1,2,3}.weight
      resS_B_branch2{x}_bn_{s,b}-> ...conv{i}.norm.{weight,bias}
      resS_B_branch1_w          -> ...resS.B.shortcut.weight
      resS_B_branch1_bn_{s,b}   -> ...shortcut.norm.{weight,bias}

    The fused BN scale/bias pairs map onto the affine-only branch of
    ``_fold_bn`` (no running stats present). Caffe2 backbones are BGR-order
    like Detectron2's default input format, so no channel flip is needed.
    Non-backbone keys (fc1000 classifier head) are dropped.
    """
    bu = "backbone.bottom_up"
    branch = {"a": 1, "b": 2, "c": 3}
    bn_suffix = {"s": "weight", "b": "bias"}
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k == "conv1_w":
            out[f"{bu}.stem.conv1.weight"] = v
        elif m := re.match(r"^res_conv1_bn_([sb])$", k):
            out[f"{bu}.stem.conv1.norm.{bn_suffix[m.group(1)]}"] = v
        elif m := re.match(r"^res(\d+)_(\d+)_branch2([abc])_w$", k):
            s, b, x = m.groups()
            out[f"{bu}.res{s}.{b}.conv{branch[x]}.weight"] = v
        elif m := re.match(r"^res(\d+)_(\d+)_branch2([abc])_bn_([sb])$", k):
            s, b, x, sb = m.groups()
            out[f"{bu}.res{s}.{b}.conv{branch[x]}.norm.{bn_suffix[sb]}"] = v
        elif m := re.match(r"^res(\d+)_(\d+)_branch1_w$", k):
            s, b = m.groups()
            out[f"{bu}.res{s}.{b}.shortcut.weight"] = v
        elif m := re.match(r"^res(\d+)_(\d+)_branch1_bn_([sb])$", k):
            s, b, sb = m.groups()
            out[f"{bu}.res{s}.{b}.shortcut.norm.{bn_suffix[sb]}"] = v
        else:
            log.debug("Dropping non-backbone Caffe2 key %r", k)
    return out


def overlay_params(
    target: Dict[str, Any], converted: Dict[str, Any]
) -> Tuple[Dict[str, Any], int, list]:
    """Copy every converted leaf whose path exists in ``target`` with a
    matching shape; leave the rest at their initialized values.

    This single rule implements both zoo-init cases: backbone-only
    checkpoints (missing paths stay initialized) and class-count mismatches
    (an 81-class ``cls_score``/``bbox_pred``/mask ``predictor`` fails the
    shape check against a ``num_classes``-sized head and is re-initialized —
    what Detectron2 logs as "skipped due to incompatible shapes" when
    fine-tuning zoo weights at a different NUM_CLASSES).

    Returns (merged, n_used, skipped) where skipped is a list of
    (path, converted_shape, target_shape_or_None).
    """
    import copy

    merged = copy.deepcopy(dict(target))
    used = 0
    skipped: list = []

    def walk(dst, src, path):
        nonlocal used
        for k, v in src.items():
            here = path + (k,)
            if isinstance(v, dict):
                if isinstance(dst.get(k), dict):
                    walk(dst[k], v, here)
                else:
                    skipped.append(("/".join(here), None, None))
            else:
                tgt = dst.get(k)
                if tgt is not None and tuple(np.shape(tgt)) == tuple(v.shape):
                    dst[k] = np.asarray(v, getattr(tgt, "dtype", np.float32))
                    used += 1
                else:
                    skipped.append(
                        (
                            "/".join(here),
                            tuple(v.shape),
                            tuple(np.shape(tgt)) if tgt is not None else None,
                        )
                    )

    walk(merged, dict(converted), ())
    return merged, used, skipped


def load_pretrained_params(
    path: str,
    model,
    num_classes: int,
    init_hw: Tuple[int, int] = (256, 256),
    seed: int = 0,
):
    """Zoo/pretrained initialization for training: random-init the target
    model, then overlay every compatible weight from a Detectron2 checkpoint
    (full-model ``.pth``/``.pkl`` in D2 naming, or a Caffe2-era backbone
    pickle). Class-count-dependent heads that do not match ``num_classes``
    stay at their fresh initialization.

    Returns (params, info) with info = {'sections': [...], 'used': int,
    'skipped': [(path, ckpt_shape, target_shape)]}.
    """
    from deepemia_tpu.models.mask_rcnn import init_params

    sd = load_torch_state_dict(path)
    if is_caffe2_names(sd):
        sd = remap_caffe2_names(sd)
        log.info("Remapped Caffe2-era backbone names in %s", path)
    depth = infer_depth(sd)
    want_depth = int(getattr(model, "depth", 50))
    if depth != want_depth:
        raise ModelLoadError(
            f"Checkpoint {path} is R{depth} but the model is R{want_depth}"
        )
    converted, sections = convert_partial_state_dict(sd, depth)
    target = init_params(model, init_hw, seed)
    # flax may hand back a FrozenDict; normalize to plain dicts
    if hasattr(target, "unfreeze"):
        target = target.unfreeze()
    tree = target["params"] if "params" in target else target
    merged, used, skipped = overlay_params(tree, converted["params"])
    for p, cs, ts in skipped:
        log.info(
            "Pretrained init: skipped %s (checkpoint %s vs model %s)", p, cs, ts
        )
    log.info(
        "Pretrained init from %s: sections %s, %d tensors loaded, %d skipped",
        path,
        sections,
        used,
        len(skipped),
    )
    return {"params": merged}, {
        "sections": sections,
        "used": used,
        "skipped": skipped,
    }
