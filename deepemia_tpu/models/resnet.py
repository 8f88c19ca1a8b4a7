"""ResNet-50/101 backbone in Flax (NHWC, TPU-native).

Replaces the Detectron2/PyTorch ResNet the reference loads from the model zoo
(``mask_rcnn_R_{50,101}_FPN_3x.yaml`` at train_model.py:128 and
models.py:136-138). Design notes:

  * NHWC layout throughout — XLA's preferred conv layout on TPU (the MXU
    consumes the channel dimension as the contraction axis);
  * FrozenBatchNorm as a per-channel affine (Detectron2 freezes all backbone
    BNs even during training, so there are no batch stats to carry — the
    weight converter folds running stats into scale/bias);
  * ``dtype`` threads a compute dtype (bfloat16 on TPU) while params stay
    float32 — mixed precision without loss-scale bookkeeping, replacing the
    reference's ``torch.cuda.amp.autocast`` (inference.py:1392-1398).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from deepemia_tpu.models.quant import conv_factory

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class FrozenBatchNorm(nn.Module):
    """Per-channel affine y = x * scale + bias.

    scale/bias are initialized to identity; the Detectron2 converter sets
    scale = gamma / sqrt(var + eps), bias = beta - mean * scale.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with optional projection shortcut."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    # int8 MXU convs (per-channel weight / dynamic per-tensor activation
    # scales, models/quant.py) — the params tree is identical either way
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        Conv = conv_factory(self.quant)
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = Conv(
                self.out_channels,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="shortcut",
            )(x)
            shortcut = FrozenBatchNorm(
                self.out_channels, self.dtype, name="shortcut_norm"
            )(shortcut)

        # STRIDE_IN_1X1: Detectron2 zoo ResNets (Caffe2/MSRA lineage) put the
        # downsampling stride on the 1x1 conv1, NOT the 3x3 conv2 (the
        # torchvision convention). Converted checkpoints are only correct
        # with the stride here — the kernel shapes are identical either way,
        # so a mismatch would be silent.
        y = Conv(
            self.bottleneck_channels,
            (1, 1),
            strides=(self.stride, self.stride),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = FrozenBatchNorm(self.bottleneck_channels, self.dtype, name="norm1")(y)
        y = nn.relu(y)
        y = Conv(
            self.bottleneck_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.bottleneck_channels, self.dtype, name="norm2")(y)
        y = nn.relu(y)
        y = Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = FrozenBatchNorm(self.out_channels, self.dtype, name="norm3")(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """ResNet-{50,101} trunk returning {res2, res3, res4, res5} (strides
    4/8/16/32), the FPN input set."""

    depth: int = 50
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        Conv = conv_factory(self.quant)
        blocks = STAGE_BLOCKS[self.depth]
        x = x.astype(self.dtype)
        # stem: 7x7/2 conv + frozen BN + 3x3/2 maxpool (the stem input is
        # normalized uint8 pixel data — int8 quantization error there is
        # below the sensor's own quantization)
        x = Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        x = FrozenBatchNorm(64, self.dtype, name="stem_norm")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats: Dict[str, jnp.ndarray] = {}
        channels = (256, 512, 1024, 2048)
        bottlenecks = (64, 128, 256, 512)
        for stage_idx, (n_blocks, out_c, bn_c) in enumerate(
            zip(blocks, channels, bottlenecks)
        ):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = BottleneckBlock(
                    out_channels=out_c,
                    bottleneck_channels=bn_c,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    quant=self.quant,
                    name=f"res{stage_idx + 2}_block{b}",
                )(x)
            feats[f"res{stage_idx + 2}"] = x
        return feats
