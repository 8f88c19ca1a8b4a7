"""RoI box + mask heads with statically-shaped inference post-processing.

Re-implements the Detectron2 StandardROIHeads / FastRCNNOutputLayers /
MaskRCNNConvUpsampleHead the reference's ``DefaultPredictor`` runs on GPU
(models.py:134-160): RoIAlign'd features -> 2-FC box head -> class scores +
class-specific box deltas -> per-class NMS -> top-K detections -> mask head
on the kept boxes. Dynamic filtering is replaced by score masking + padded
top-k so the whole chain is one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepemia_tpu.config.constants import StaticShapes
from deepemia_tpu.models.roi_align import roi_align_dispatch
from deepemia_tpu.ops import boxes as box_ops


class BoxHead(nn.Module):
    """Flatten -> FC 1024 -> FC 1024 (Detectron2 FastRCNNConvFCHead)."""

    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [N,7,7,C]
        n = x.shape[0]
        # Detectron2 flattens NCHW (C,H,W) order; match it so converted FC
        # weights line up.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        return x


class BoxPredictor(nn.Module):
    """Class logits (num_classes+1, bg last) + class-specific deltas."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class Deconv2x2(nn.Module):
    """Stride-2 kernel-2 transposed conv as a block-expansion einsum.

    With stride == kernel there is no output overlap, so the transposed conv
    is exactly: each input pixel maps to a 2x2 output block through a
    [2,2,I,O] tensor — one MXU matmul after reshape. This replaces
    nn.ConvTranspose whose XLA-CPU gradient is ~100x slower, and gives the
    TPU a plain contraction instead of a strided conv-transpose.
    Kernel layout [kh,kw,I,O]; torch ConvTranspose2d parity verified in
    tests/test_models.py.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [N,H,W,I] -> [N,2H,2W,O]
        n, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum(
            "nhwi,pqio->nhpwqo",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
        )
        y = y.reshape(n, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


class MaskHead(nn.Module):
    """4 convs + deconv + 1x1 per-class mask logits (28x28)."""

    num_classes: int
    conv_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [N,14,14,C]
        for i in range(4):
            x = nn.relu(
                nn.Conv(
                    self.conv_dim,
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    dtype=self.dtype,
                    name=f"mask_fcn{i + 1}",
                )(x)
            )
        x = nn.relu(Deconv2x2(self.conv_dim, dtype=self.dtype, name="deconv")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="predictor")(x)


class Detections(NamedTuple):
    """Padded per-image detections ([D] rows, valid mask)."""

    boxes: jnp.ndarray  # [D,4]
    scores: jnp.ndarray  # [D]
    classes: jnp.ndarray  # [D] int32
    valid: jnp.ndarray  # [D] bool
    mask_probs: jnp.ndarray  # [D,28,28] sigmoid probabilities


def fast_rcnn_inference(
    scores: jnp.ndarray,
    deltas: jnp.ndarray,
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    image_hw,
    score_threshold: float,
    nms_threshold: float = 0.5,
    max_detections: int = StaticShapes.MAX_DETECTIONS,
):
    """Per-class decode + threshold + NMS + top-K, fully padded.

    scores [N,C+1] raw logits, deltas [N,C*4], proposals [N,4] ->
    (boxes [D,4], scores [D], classes [D], valid [D]).
    Matches Detectron2 fast_rcnn_inference_single_image semantics.
    """
    n, num_classes = scores.shape[0], scores.shape[1] - 1
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)[:, :num_classes]
    deltas = deltas.reshape(n, num_classes, 4).astype(jnp.float32)
    boxes = box_ops.apply_deltas(proposals[:, None, :], deltas)  # [N,C,4]
    boxes = box_ops.clip_boxes(boxes, image_hw[0], image_hw[1])

    flat_boxes = boxes.reshape(n * num_classes, 4)
    flat_scores = probs.reshape(n * num_classes)
    flat_classes = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))
    flat_valid = (
        (flat_scores > score_threshold)
        & jnp.repeat(proposal_valid, num_classes)
    )

    # keep the NMS matrix small: restrict to the top candidates first
    k = min(max_detections * 8, flat_scores.shape[0])
    cand_scores = jnp.where(flat_valid, flat_scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(cand_scores, k)
    cand_boxes = flat_boxes[idx]
    cand_classes = flat_classes[idx]
    cand_valid = jnp.isfinite(top_scores)

    keep = box_ops.batched_nms_mask(
        cand_boxes, top_scores, cand_classes, nms_threshold, valid=cand_valid
    )
    final_scores = jnp.where(keep, top_scores, -jnp.inf)
    top, didx = jax.lax.top_k(final_scores, max_detections)
    return (
        cand_boxes[didx],
        jnp.where(jnp.isfinite(top), top, 0.0),
        cand_classes[didx],
        jnp.isfinite(top),
    )


class ROIHeads(nn.Module):
    """Box + mask heads over FPN features for one image."""

    num_classes: int
    dtype: Any = jnp.float32
    # the zoo configs the reference loads use POOLER_SAMPLING_RATIO=0
    # (adaptive ceil(roi/out) per axis) — emulated exactly for grids <= 2
    # (all of levels 2-4) inside the static sample grid, see roi_align.py
    adaptive_pooler: bool = True
    # RoIAlign backend for the INFERENCE path (__call__): 'auto' picks the
    # Pallas window-DMA kernel on TPU. Direct box_forward/mask_forward calls
    # (the training losses) default to ``train_roi_backend``: the XLA gather
    # forward with the scatter-free matmul backward (roi_align.py: autodiff's
    # scatter-add is ~100 ms/step on TPU; the dense backward is MXU matmuls).
    # 'pallas_fast_grad' swaps the forward for the window-DMA kernel while
    # keeping the same matmul backward.
    roi_backend: str = "auto"
    train_roi_backend: str = "xla_fast_grad"

    def setup(self):
        self.box_head = BoxHead(dtype=self.dtype)
        self.box_predictor = BoxPredictor(self.num_classes, dtype=self.dtype)
        self.mask_head = MaskHead(self.num_classes, dtype=self.dtype)

    def box_forward(
        self,
        features: Dict[str, jnp.ndarray],
        boxes: jnp.ndarray,
        backend: str | None = None,
        valid=None,
    ):
        backend = backend or self.train_roi_backend
        pooled = roi_align_dispatch(
            features,
            boxes,
            output_size=7,
            adaptive_ratio=self.adaptive_pooler,
            backend=backend,
            valid=valid,
        )
        return self.box_predictor(self.box_head(pooled.astype(self.dtype)))

    def mask_forward(
        self,
        features: Dict[str, jnp.ndarray],
        boxes: jnp.ndarray,
        backend: str | None = None,
        valid=None,
    ):
        backend = backend or self.train_roi_backend
        pooled = roi_align_dispatch(
            features,
            boxes,
            output_size=14,
            adaptive_ratio=self.adaptive_pooler,
            backend=backend,
            valid=valid,
        )
        return self.mask_head(pooled.astype(self.dtype))  # [D,28,28,C]

    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: jnp.ndarray,
        proposal_valid: jnp.ndarray,
        image_hw,
        score_threshold: float = 0.05,
        nms_threshold: float = 0.5,
        max_detections: int = StaticShapes.MAX_DETECTIONS,
    ) -> Detections:
        # invalid proposal rows are excluded by fast_rcnn_inference's
        # validity gate, so the pooler may skip their windows outright
        scores, deltas = self.box_forward(
            features, proposals, backend=self.roi_backend,
            valid=proposal_valid,
        )
        b, s, c, v = fast_rcnn_inference(
            scores,
            deltas,
            proposals,
            proposal_valid,
            image_hw,
            score_threshold,
            nms_threshold,
            max_detections,
        )
        mask_logits = self.mask_forward(
            features, b, backend=self.roi_backend, valid=v
        )  # [D,28,28,C]
        sel = jax.nn.one_hot(c, self.num_classes, dtype=mask_logits.dtype)
        m = jnp.einsum("dhwc,dc->dhw", mask_logits, sel)
        return Detections(
            boxes=b,
            scores=s,
            classes=c,
            valid=v,
            mask_probs=jax.nn.sigmoid(m.astype(jnp.float32)),
        )
