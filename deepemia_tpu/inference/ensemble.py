"""Multi-model (R50 + R101) weighted ensemble.

Parity surface: reference ``run_ensemble_inference`` (inference.py:1464-1598):
run every member, filter per-class/confidence, then dedup across members at
the class IoU threshold. Note the reference loads ensemble weights
(config/config.yaml:90-95) but never multiplies them into the scores (they
are only logged — SURVEY.md Q6); here weighting is real and on by default,
with ``apply_weights=False`` restoring reference behavior bit-for-bit.

Design: members run as separate compiled programs (different param trees,
R50 vs R101 topologies); their padded InstanceSets merge on device.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Sequence, Tuple

from deepemia_tpu.inference.detections import (
    InstanceSet,
    concat_instances,
    dedup_by_mask_iou,
)
from deepemia_tpu.inference.engine import ClassSettings, TileEngine

log = logging.getLogger("deepemia_tpu.ensemble")


def run_ensemble(
    engines: Sequence[Tuple[str, TileEngine, float]],
    image,
    settings: ClassSettings,
    image_hw,
    dedup_iou: float = 0.4,
    apply_weights: bool = True,
    capacity: int | None = None,
    secondary_class_filter=None,
    upscale=None,
) -> Tuple[InstanceSet, Any]:
    """Run all (name, engine, weight) members and fuse.

    Returns (merged InstanceSet, quality score of the image). A member that
    raises is skipped with a log line (reference swallows member failures,
    inference.py:1566-1568).

    ``secondary_class_filter``: optional set of class ids — members beyond
    the first only contribute detections of these classes (the reference's
    ``ensemble_settings.small_classes_only`` gating, inference.py:819-826:
    large classes use the primary predictor alone, small classes get the
    full ensemble).
    """
    import jax
    import jax.numpy as jnp

    parts: List[InstanceSet] = []
    quality = 0.0
    cap = capacity or max(e.capacity for _, e, _ in engines)
    # Member-parallel ensembles put each engine on a DISJOINT sub-mesh
    # (pipeline._build_engines): the async member dispatches then execute
    # concurrently on their own chips instead of queueing on a shared
    # mesh. Their (small, capped) outputs must land on one common device
    # before the merge can mix them in a single program.
    meshes = {
        tuple(m.devices.flat) if m is not None else None
        for m in (getattr(e, "mesh", None) for _, e, _ in engines)
    }
    common_dev = None
    if len(meshes) > 1:
        first = getattr(engines[0][1], "mesh", None)
        common_dev = (
            first.devices.flat[0] if first is not None else jax.devices()[0]
        )
    for member_idx, (name, engine, weight) in enumerate(engines):
        try:
            inst, quality = engine.infer(image, settings, upscale=upscale)
        except Exception as e:  # noqa: BLE001 - member isolation
            log.error("Ensemble member %s failed: %s", name, e)
            continue
        if common_dev is not None:
            # async transfer of the capped instance set; does not force
            # the member's program to finish before the next dispatches
            inst = jax.device_put(inst, common_dev)
        if secondary_class_filter is not None and member_idx > 0:
            allowed = jnp.asarray(
                sorted(secondary_class_filter) or [-1], jnp.int32
            )
            keep = (inst.classes[:, None] == allowed[None, :]).any(axis=1)
            inst = inst._replace(valid=inst.valid & keep)
        if apply_weights:
            inst = inst._replace(scores=inst.scores * float(weight))
        parts.append(inst)
    if not parts:
        from deepemia_tpu.inference.detections import empty_instances

        return empty_instances(cap), quality
    merged = concat_instances(parts, cap)
    merged = dedup_by_mask_iou(merged, image_hw, dedup_iou, class_aware=True)
    return merged, quality


def weights_from_config(inference_settings: Dict) -> Dict[str, float]:
    es = inference_settings.get("ensemble_settings", {})
    w = es.get("weights", {}) or {}
    return {"R50": float(w.get("R50", 0.6)), "R101": float(w.get("R101", 0.4))}
