"""Spatial constraints between detected classes as masked matrix ops.

Parity surface: reference ``src/utils/spatial_constraints.py`` —
config format (:33-115): ``{enabled, containment_threshold, overlap_rules:
{class: {allow_overlap, max_iou_threshold}}, containment_rules:
{child_class: parent_class}}``; overlap filtering keeps the higher-scored
instance of a same-class pair whose mask IoU exceeds the class's
``max_iou_threshold`` (:192-277); containment filtering drops child
instances whose best containment inside any (surviving) parent-class mask is
below the threshold (intersection/child-area, default 0.95, :280-398).

Vectorized design: one low-res mask paste feeds one IoU matrix (overlap
rules, reused from the NMS machinery with per-class thresholds) and one
containment matrix (child rows × parent columns, masked max).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.inference.detections import (
    InstanceSet,
    filter_instances,
    lowres_masks,
)
from deepemia_tpu.ops import boxes as box_ops
from deepemia_tpu.ops import masks as mask_ops

log = logging.getLogger("deepemia_tpu.constraints")


class ConstraintSpec(NamedTuple):
    """Static, array-encoded constraint configuration for C classes."""

    enabled: bool
    # overlap: per-class max IoU (1.0 = unconstrained)
    overlap_max_iou: np.ndarray  # [C] float32
    # containment: parent class per child class (-1 = no rule)
    containment_parent: np.ndarray  # [C] int32
    containment_threshold: float


def spec_from_config(
    constraints_cfg: Optional[Dict[str, Any]], num_classes: int
) -> ConstraintSpec:
    """Parse the reference YAML schema (spatial_constraints.py:58-115) into
    arrays. Class keys may be ints or 'class_N' strings."""
    cfg = constraints_cfg or {}
    overlap = np.ones((num_classes,), np.float32)
    parent = np.full((num_classes,), -1, np.int32)

    def class_id(key) -> int:
        if isinstance(key, int):
            return key
        return int(str(key).replace("class_", ""))

    for key, rule in (cfg.get("overlap_rules") or {}).items():
        c = class_id(key)
        if 0 <= c < num_classes and isinstance(rule, dict):
            allow = rule.get("allow_overlap", True)
            max_iou = float(rule.get("max_iou_threshold", 0.5))
            if allow and max_iou >= 0.9:
                continue  # unconstrained (reference :232-234)
            overlap[c] = max_iou

    for child, par in (cfg.get("containment_rules") or {}).items():
        c = class_id(child)
        if 0 <= c < num_classes:
            parent[c] = class_id(par)

    return ConstraintSpec(
        enabled=bool(cfg.get("enabled", False)),
        overlap_max_iou=overlap,
        containment_parent=parent,
        containment_threshold=float(cfg.get("containment_threshold", 0.95)),
    )


def apply_spatial_constraints(
    inst: InstanceSet,
    image_hw,
    spec: ConstraintSpec,
    stride: int = 8,
) -> InstanceSet:
    """Apply overlap then containment rules (reference order, :401-460).

    Dispatches one jitted program (two pastes + two matrix passes); the
    eager form is ~50 small dispatches, which dominates on remote devices.
    """
    if not spec.enabled:
        return inst
    return _apply_constraints_jit(
        inst,
        (int(image_hw[0]), int(image_hw[1])),
        jnp.asarray(spec.overlap_max_iou),
        jnp.asarray(spec.containment_parent),
        spec.containment_threshold,
        stride,
    )


@partial(jax.jit, static_argnums=(1, 5))
def _apply_constraints_jit(
    inst: InstanceSet,
    image_hw,
    overlap_max_iou: jnp.ndarray,
    containment_parent: jnp.ndarray,
    containment_threshold,
    stride: int,
) -> InstanceSet:
    spec = ConstraintSpec(
        enabled=True,
        overlap_max_iou=overlap_max_iou,
        containment_parent=containment_parent,
        containment_threshold=containment_threshold,
    )
    lm = lowres_masks(inst, image_hw, stride)
    iou = mask_ops.mask_iou_matrix(lm, lm)

    # --- overlap rules: same-class greedy suppression with per-class IoU cap
    overlap_thr = jnp.asarray(spec.overlap_max_iou)[inst.classes]
    same_class = inst.classes[:, None] == inst.classes[None, :]
    keep = box_ops.nms_mask(
        inst.boxes,
        inst.scores,
        overlap_thr,
        valid=inst.valid,
        iou=jnp.where(same_class, iou, 0.0),
    )
    inst = filter_instances(inst, keep)

    # --- containment rules
    parent_of = jnp.asarray(spec.containment_parent)[inst.classes]  # [K]
    has_rule = parent_of >= 0
    lm = lm & inst.valid[:, None, None]
    cont = mask_ops.mask_containment_matrix(lm, lm)  # [K,K] child x parent
    is_parent = (
        (inst.classes[None, :] == parent_of[:, None])
        & inst.valid[None, :]
    )
    best = jnp.max(jnp.where(is_parent, cont, 0.0), axis=1)  # [K]
    keep = ~has_rule | (best >= spec.containment_threshold)
    return filter_instances(inst, keep)
