"""A/B the RoIAlign point-gather vs a paired-column gather on TPU.

The train-step trace (tools/profile_train_step.py) attributes ~14 ms of the
53 ms step to the two RoIAlign forward gathers, at ~60-110 GB/s effective —
descriptor-bound: N*P*P*4 gather rows of one 256-channel feature row each.
Fetching both x-corners of a bilinear sample as ONE contiguous (2, C) slice
halves the descriptor count at identical useful bytes. This tool measures
both formulations in isolation at the training shapes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.models.roi_align import (
    _sample_geometry,
    multilevel_roi_align,
)
from deepemia_tpu.models.anchors import STRIDES


def paired_roi_align(features, boxes, output_size=7, sampling_ratio=2,
                     levels=("p2", "p3", "p4", "p5"), adaptive_ratio=True):
    n = boxes.shape[0]
    s = sampling_ratio
    p = output_size * s
    c = features[levels[0]].shape[-1]
    flat = jnp.concatenate(
        [features[nm].reshape(-1, c) for nm in levels], axis=0
    )
    heights = np.array([features[nm].shape[0] for nm in levels], np.int32)
    widths = np.array([features[nm].shape[1] for nm in levels], np.int32)
    strides = np.array([STRIDES[nm] for nm in levels], np.float32)
    g = _sample_geometry(
        boxes, heights, widths, strides, output_size, s, adaptive_ratio
    )
    lw = g.lw
    cs = jnp.minimum(g.xi0c, jnp.maximum(lw[:, None] - 2, 0))  # [N,P]

    def flat_start(yy):  # [N,P] -> [N,P,P]
        return (
            g.base[:, None, None]
            + yy[:, :, None] * lw[:, None, None]
            + cs[:, None, :]
        )

    st = jnp.stack([flat_start(g.yi0c), flat_start(g.yi1c)], axis=-1)
    # bins contiguous: [n, oy, sy, ox, sx, r] -> [n, oy, ox, sy, sx, r]
    st6 = st.reshape(n, output_size, s, output_size, s, 2)
    st6 = jnp.transpose(st6, (0, 1, 3, 2, 4, 5))
    starts = st6.reshape(-1, 1)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    pairs = jax.lax.gather(
        flat, starts, dn, slice_sizes=(2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [M, 2, C]

    wx0 = (1.0 - g.fx) * g.vx  # [N,P]
    wx1 = g.fx * g.vx
    a0 = wx0 * (g.xi0c == cs) + wx1 * (g.xi1c == cs)
    a1 = wx0 * (g.xi0c == cs + 1) + wx1 * (g.xi1c == cs + 1)
    wy0 = (1.0 - g.fy) * g.vy
    wy1 = g.fy * g.vy
    # [N, Py, Px, r, q]
    wq = jnp.stack(
        [
            jnp.stack([wy0[:, :, None] * a0[:, None, :],
                       wy0[:, :, None] * a1[:, None, :]], axis=-1),
            jnp.stack([wy1[:, :, None] * a0[:, None, :],
                       wy1[:, :, None] * a1[:, None, :]], axis=-1),
        ],
        axis=-2,
    )  # [N,Py,Px,2,2]
    w6 = wq.reshape(n, output_size, s, output_size, s, 2, 2)
    w6 = jnp.transpose(w6, (0, 1, 3, 2, 4, 5, 6)).reshape(
        n * output_size * output_size, s * s * 2 * 2, 1
    )
    rows = pairs.reshape(n * output_size * output_size, s * s * 2 * 2, c)
    pooled = (rows * w6.astype(rows.dtype)).sum(axis=1) / (s * s)
    return pooled.reshape(n, output_size, output_size, c)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., 0])


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    feats = {}
    hh, ww = size // 4, size // 4
    for nm in ("p2", "p3", "p4", "p5"):
        feats[nm] = jnp.asarray(
            rng.standard_normal((hh, ww, 256)), dtype
        )
        hh, ww = hh // 2, ww // 2

    for label, n, out in (("box(512@7)", 512, 7), ("mask(128@14)", 128, 14)):
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, size - 64, n)
        boxes[:, 1] = rng.uniform(0, size - 64, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 64, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 64, n)
        boxes = jnp.asarray(boxes)

        f_cur = jax.jit(lambda f, b: multilevel_roi_align(
            f, b, output_size=out, adaptive_ratio=True))
        f_pair = jax.jit(lambda f, b: paired_roi_align(
            f, b, output_size=out, adaptive_ratio=True))

        a = f_cur(feats, boxes)
        b = f_pair(feats, boxes)
        sync(a); sync(b)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        reps = 50
        for name, fn in (("point4", f_cur), ("pair2", f_pair)):
            fn(feats, boxes)
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(feats, boxes)
            sync(r)
            dt = (time.perf_counter() - t0) / reps
            print(f"{label} {name}: {dt * 1e3:8.3f} ms")
        print(f"{label} max|diff| = {err:.2e}")


if __name__ == "__main__":
    main()
