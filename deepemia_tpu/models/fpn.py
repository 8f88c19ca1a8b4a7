"""Feature Pyramid Network head over ResNet features.

Standard FPN as used by the reference's zoo configs: 1x1 laterals on res2-5,
top-down nearest-neighbor upsample + add, 3x3 output convs -> p2-p5, plus p6
from stride-2 max-pool of p5 (the RPN-only level).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from deepemia_tpu.models.quant import conv_factory


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample in NHWC (matches F.interpolate(nearest))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    """res2..res5 -> {p2, p3, p4, p5, p6}, all ``out_channels`` wide."""

    out_channels: int = 256
    dtype: Any = jnp.float32
    # int8 MXU convs (models/quant.py); params tree unchanged
    quant: bool = False

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        Conv = conv_factory(self.quant)
        laterals = {}
        for i, name in enumerate(("res2", "res3", "res4", "res5")):
            laterals[name] = Conv(
                self.out_channels,
                (1, 1),
                dtype=self.dtype,
                name=f"lateral_{name}",
            )(feats[name])

        # top-down pathway
        td = {"res5": laterals["res5"]}
        for upper, lower in (("res5", "res4"), ("res4", "res3"), ("res3", "res2")):
            td[lower] = laterals[lower] + _upsample2x(td[upper])

        out = {}
        for level, name in ((2, "res2"), (3, "res3"), (4, "res4"), (5, "res5")):
            out[f"p{level}"] = Conv(
                self.out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name=f"output_p{level}",
            )(td[name])
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out
