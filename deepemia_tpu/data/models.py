"""Trained-model discovery and loading.

Parity surface: reference ``src/data/models.py`` — checkpoint discovery under
``split_dir/<dataset>/rcnn_r{50,101}/model_final_r*.pth`` (:33-51) and
predictor construction with threshold + num_classes (:110-160).

Two checkpoint flavors load transparently:
  * native Orbax directories written by the TPU trainer
    (``model_final_r{50,101}.orbax``), and
  * Detectron2 ``.pth`` files from the reference (converted on load via
    models/weights.py) — the migration path for existing users.

The reference's int8 "quantized predictor" path (models.py:67-96) is dead
code upstream (SURVEY.md Q2) and is superseded here by bfloat16 compute,
which is the TPU-native reduced-precision path.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

from deepemia_tpu.models.mask_rcnn import MaskRCNN, build_model
from deepemia_tpu.utils.exceptions import ModelLoadError

log = logging.getLogger("deepemia_tpu.models_io")

# architecture revision of natively-saved checkpoints; v2 = stride on the
# 1x1 conv (Detectron2 STRIDE_IN_1X1). v1 checkpoints load but warn: their
# weights were trained against stride-on-conv2 and compute different
# activations under v2.
ARCH_VERSION = 2


def get_trained_model_paths(
    split_dir: str, dataset_name: str
) -> Dict[str, str]:
    """{'R50': path, 'R101': path} for checkpoints that exist (reference
    get_trained_model_paths, models.py:33-51)."""
    base = Path(os.path.expanduser(split_dir)) / dataset_name
    found: Dict[str, str] = {}
    for rcnn, sub in (("R50", "rcnn_r50"), ("R101", "rcnn_r101")):
        d = base / sub
        if not d.is_dir():
            continue
        suffix = rcnn.lower()
        for cand in (
            d / f"model_final_{suffix}.orbax",
            d / f"model_final_{suffix}.pth",
            d / "model_final.pth",
            d / f"model_final_{suffix}.pkl",
            d / "model_final.pkl",
        ):
            if cand.exists():
                found[rcnn] = str(cand)
                break
    return found


def load_model(
    path: str,
    num_classes: Optional[int] = None,
    use_bf16: bool = True,
    quant_backbone: str = "none",
) -> Tuple[MaskRCNN, dict]:
    """Load a checkpoint (Orbax dir or Detectron2 .pth) -> (model, params).

    ``quant_backbone``: 'none' | 'trunk' | 'full' — int8 MXU serving
    (models/quant.py). Unlike the reference's quantization (a SEPARATE
    ``model_final_quantized.pth`` artifact that no code path ever produces,
    /root/reference/src/data/models.py:130-160, SURVEY Q2), int8 here is a
    forward-time transform of the same float checkpoint: no second file.
    """
    path = os.path.expanduser(path)
    if path.endswith((".pth", ".pkl")):
        from deepemia_tpu.models.weights import load_detectron2_checkpoint

        params, ckpt_classes, depth = load_detectron2_checkpoint(path)
        n = num_classes or ckpt_classes
        if num_classes and num_classes != ckpt_classes:
            raise ModelLoadError(
                f"Checkpoint has {ckpt_classes} classes, dataset expects {num_classes}",
                details={"path": path},
            )
        model = build_model(
            f"R{depth}",
            num_classes=n,
            use_bf16=use_bf16,
            quant_backbone=quant_backbone,
        )
        return model, params
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        meta_path = Path(path) / "deepemia_meta.json"
        import json

        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
        else:
            raise ModelLoadError(f"Missing deepemia_meta.json in {path}")
        ckpt_arch = int(meta.get("arch_version", 1))
        if ckpt_arch != ARCH_VERSION:
            log.warning(
                "Checkpoint %s was saved with arch_version %d (current %d): "
                "parameter shapes match but strided blocks compute "
                "differently — retrain or reconvert for correct results",
                path, ckpt_arch, ARCH_VERSION,
            )
        model = build_model(
            meta["backbone"],
            num_classes=meta["num_classes"],
            use_bf16=use_bf16,
            quant_backbone=quant_backbone,
        )
        ckptr = ocp.StandardCheckpointer()
        from deepemia_tpu.models.mask_rcnn import init_params

        template = init_params(model, tuple(meta.get("init_hw", (64, 64))))
        params = ckptr.restore(os.path.abspath(os.path.join(path, "params")), template)
        return model, params
    raise ModelLoadError(f"Unrecognized checkpoint format: {path}")


def save_orbax_checkpoint(
    params,
    path: str,
    backbone: str,
    num_classes: int,
    init_hw: Tuple[int, int] = (64, 64),
) -> str:
    """Write a native checkpoint directory (Orbax params + meta json)."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params, force=True)
    ckptr.wait_until_finished()
    Path(path, "deepemia_meta.json").write_text(
        json.dumps(
            {
                "backbone": backbone,
                "num_classes": num_classes,
                "init_hw": list(init_hw),
                # bumped when the architecture changes in a way that keeps
                # parameter shapes but alters computation (e.g. the
                # STRIDE_IN_1X1 fix) — loads of older checkpoints warn
                "arch_version": ARCH_VERSION,
            }
        )
    )
    return path


def choose_and_use_model(
    model_paths: Dict[str, str],
    num_classes: int,
    prefer: str = "R101",
    use_bf16: bool = True,
):
    """Pick the preferred available backbone (reference choose_and_use_model,
    models.py:110-160 — with its Q1 argument-order bug fixed: this takes the
    class count directly, not a metadata object in the wrong slot)."""
    if not model_paths:
        raise ModelLoadError("No trained models found")
    key = prefer if prefer in model_paths else sorted(model_paths)[0]
    model, params = load_model(model_paths[key], num_classes, use_bf16)
    return key, model, params
