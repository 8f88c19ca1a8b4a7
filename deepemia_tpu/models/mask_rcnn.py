"""Mask R-CNN R50/R101-FPN: the flagship model, one jit-able forward.

TPU-native replacement for the Detectron2 ``DefaultPredictor`` stack the
reference builds in models.py:134-160 and drives from inference.py. The whole
pipeline — normalize, backbone, FPN, RPN proposal selection, RoI heads,
per-class NMS, mask logits — is a single statically-shaped program; the only
host interaction is feeding the image batch and reading padded detection
tensors.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepemia_tpu.config.constants import StaticShapes
from deepemia_tpu.models import anchors as anchor_lib
from deepemia_tpu.models.fpn import FPN
from deepemia_tpu.models.heads import Detections, ROIHeads
from deepemia_tpu.models.resnet import ResNet
from deepemia_tpu.models.rpn import RPNHead, select_proposals
from deepemia_tpu.ops.image import PIXEL_MEAN_BGR, PIXEL_STD_BGR


class MaskRCNN(nn.Module):
    """R{depth}-FPN Mask R-CNN.

    Input convention: [H,W,3] float32 raw BGR pixels (0-255), static H/W
    divisible by 64. Outputs padded ``Detections``.
    """

    depth: int = 50
    num_classes: int = 2
    dtype: Any = jnp.float32  # compute dtype (bfloat16 on TPU)
    # POOLER_SAMPLING_RATIO=0 emulation (reference zoo-config behavior);
    # set False for the fixed 2x2 sample grid
    adaptive_pooler: bool = True
    # inference RoIAlign backend: 'auto' = Pallas window-DMA kernel on TPU
    roi_backend: str = "auto"
    # training sub-forward (box_forward/mask_forward) backend:
    # 'xla_fast_grad' = differentiable XLA gather + matmul backward;
    # 'pallas_fast_grad' = window-DMA kernel forward, same matmul backward
    train_roi_backend: str = "xla_fast_grad"
    # int8 MXU serving (replaces the reference's dead qnnpack path, SURVEY
    # Q2): 'none' = float convs; 'trunk' = int8 ResNet, float FPN (the FPN
    # outputs feed RoIAlign directly, so localization keeps full precision);
    # 'full' = int8 ResNet + FPN. Same params tree in all modes.
    quant_backbone: str = "none"

    def setup(self):
        q = self.quant_backbone
        self.backbone = ResNet(
            depth=self.depth, dtype=self.dtype, quant=q in ("trunk", "full")
        )
        self.fpn = FPN(dtype=self.dtype, quant=q == "full")
        self.rpn_head = RPNHead(dtype=self.dtype)
        self.roi_heads = ROIHeads(
            self.num_classes,
            dtype=self.dtype,
            adaptive_pooler=self.adaptive_pooler,
            roi_backend=self.roi_backend,
            train_roi_backend=self.train_roi_backend,
        )

    def normalize(self, image: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)
        std = jnp.asarray(PIXEL_STD_BGR, jnp.float32)
        return ((image.astype(jnp.float32) - mean) / std).astype(self.dtype)

    def features(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """[H,W,3] -> {p2..p6: [h,w,256]} (batch dim added/removed inside)."""
        x = self.normalize(image)[None]
        feats = self.fpn(self.backbone(x))
        return {k: v[0] for k, v in feats.items()}

    # -- training-path sub-forwards (each usable via apply(method=...)) ----

    def rpn_forward(self, feats: Dict[str, jnp.ndarray]):
        """feats {level: [h,w,c]} -> per-level (objectness, deltas), batch
        dim stripped."""
        logits, regs = self.rpn_head({k: v[None] for k, v in feats.items()})
        return (
            {k: v[0] for k, v in logits.items()},
            {k: v[0] for k, v in regs.items()},
        )

    def box_forward(self, feats: Dict[str, jnp.ndarray], boxes: jnp.ndarray):
        return self.roi_heads.box_forward(feats, boxes)

    def mask_forward(self, feats: Dict[str, jnp.ndarray], boxes: jnp.ndarray):
        return self.roi_heads.mask_forward(feats, boxes)

    def detect_from_features(
        self,
        feats: Dict[str, jnp.ndarray],
        image_hw,
        score_threshold: float = 0.05,
        nms_threshold: float = 0.5,
        proposal_topk: int = StaticShapes.POST_NMS_TOPK_TEST,
        max_detections: int = StaticShapes.MAX_DETECTIONS,
    ) -> Detections:
        """RPN + RoI heads on precomputed FPN features — the per-tile tail
        when the backbone runs over a BATCH of tiles (the tile engine
        batches features so convs see batch B instead of 8x batch-1)."""
        h, w = image_hw
        logits, regs = self.rpn_head({k: v[None] for k, v in feats.items()})
        feat_shapes = {k: (v.shape[0], v.shape[1]) for k, v in feats.items()}
        anchors = anchor_lib.all_anchors(feat_shapes)
        proposals = select_proposals(
            {k: v[0] for k, v in logits.items()},
            {k: v[0] for k, v in regs.items()},
            anchors,
            (h, w),
            post_nms_topk=proposal_topk,
        )
        return self.roi_heads(
            {k: feats[k] for k in ("p2", "p3", "p4", "p5")},
            proposals.boxes,
            proposals.valid,
            (h, w),
            score_threshold=score_threshold,
            nms_threshold=nms_threshold,
            max_detections=max_detections,
        )

    def __call__(
        self,
        image: jnp.ndarray,
        score_threshold: float = 0.05,
        nms_threshold: float = 0.5,
        proposal_topk: int = StaticShapes.POST_NMS_TOPK_TEST,
        max_detections: int = StaticShapes.MAX_DETECTIONS,
    ) -> Detections:
        h, w = image.shape[0], image.shape[1]
        feats = self.features(image)
        return self.detect_from_features(
            feats,
            (h, w),
            score_threshold=score_threshold,
            nms_threshold=nms_threshold,
            proposal_topk=proposal_topk,
            max_detections=max_detections,
        )


def build_model(
    backbone: str = "R50",
    num_classes: int = 2,
    use_bf16: bool = True,
    roi_backend: str = "auto",
    train_roi_backend: str = "xla_fast_grad",
    quant_backbone: str = "none",
) -> MaskRCNN:
    """Model factory keyed the way the reference keys checkpoints
    (train_model.py:230-238 suffixes r50/r101)."""
    depth = 101 if "101" in backbone else 50
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    return MaskRCNN(
        depth=depth,
        num_classes=num_classes,
        dtype=dtype,
        roi_backend=roi_backend,
        train_roi_backend=train_roi_backend,
        quant_backbone=quant_backbone,
    )


def init_params(model: MaskRCNN, image_hw: Tuple[int, int] = (512, 512), seed: int = 0):
    """Random-init parameters (dev/test path; production uses converted or
    trained checkpoints). Jitted: eager init dispatches thousands of tiny
    ops, which is minutes over a remote-device tunnel."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((*image_hw, 3), jnp.float32)
    return jax.jit(model.init)(rng, dummy)


@partial(jax.jit, static_argnums=(0,), static_argnames=("score_threshold",))
def predict(model: MaskRCNN, params, image, score_threshold: float = 0.05):
    """Jitted single-image forward (compile cache keyed on image shape)."""
    return model.apply(params, image, score_threshold=score_threshold)
