"""RoIAlign (aligned=True) as a vectorized XLA gather program.

Replaces Detectron2's CUDA ``ROIAlign`` op (implicit in every reference
``predictor(image)`` call, e.g. inference.py:2107). Semantics match
ROIAlignV2: half-pixel offset (``aligned=True``), bilinear sampling on a
``sampling_ratio × sampling_ratio`` sub-grid per output bin, average
pooled. The reference op's adaptive sampling ratio (ceil(roi/out)) is a
dynamic shape; here the grid is a static 2×2 whose sample POSITIONS
collapse per box to emulate the adaptive rule (``adaptive_ratio=True``,
exact for adaptive grids of 1 or 2 — every box on levels 2-4).

Multi-level assignment follows the FPN paper rule used by Detectron2:
level = floor(4 + log2(sqrt(area)/224)) clamped to [2,5]; each box is pooled
from every level and the right one selected by mask — 4 gathers of which 3
are discarded, but no dynamic partitioning, so the whole head stays one
compiled program. (A Pallas scalar-prefetch kernel that gathers only the
assigned level is the planned optimization.)

Adaptive sampling ratio: the Detectron2 zoo configs the reference loads set
``POOLER_SAMPLING_RATIO: 0`` — the CUDA op then uses ``ceil(roi/out)``
samples per bin PER AXIS. FPN level assignment keeps roi/stride in [7,14)
for levels 2-4, so that adaptive grid is always 1 or 2 there — which a
fixed 2x2 sample grid can reproduce EXACTLY by collapsing both sub-samples
to the bin center whenever the adaptive rule says 1 (duplicated samples
average to the single-sample value). ``adaptive_ratio=True`` does this at
zero extra cost; only level-5 boxes wider than ``out`` cells (where the
reference uses >2 samples/bin) remain approximated by the 2x2 grid.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.models.anchors import STRIDES


def roi_align_level(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    stride: int,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign from a single feature map.

    features [H,W,C] (one image), boxes [N,4] XYXY in image coords ->
    [N, output_size, output_size, C].
    """
    h, w, c = features.shape
    n = boxes.shape[0]
    s = sampling_ratio
    p = output_size * s  # sample grid edge

    scale = 1.0 / stride
    # aligned=True: continuous coords, half-pixel offset
    x0 = boxes[:, 0] * scale - 0.5
    y0 = boxes[:, 1] * scale - 0.5
    x1 = boxes[:, 2] * scale - 0.5
    y1 = boxes[:, 3] * scale - 0.5
    bw = x1 - x0
    bh = y1 - y0

    # sample point centers: bin b, sub-sample k -> (b + (k+0.5)/s) / out
    grid = (jnp.arange(p, dtype=jnp.float32) + 0.5) / p  # [P]
    sx = x0[:, None] + grid[None, :] * bw[:, None]  # [N,P]
    sy = y0[:, None] + grid[None, :] * bh[:, None]  # [N,P]

    def bilinear(feat, xs, ys):
        """feat [H,W,C]; xs,ys [P] -> [P,P,C] sampled at (ys[i], xs[j])."""
        xi0 = jnp.floor(xs).astype(jnp.int32)
        yi0 = jnp.floor(ys).astype(jnp.int32)
        fx = xs - xi0
        fy = ys - yi0
        xi0c = jnp.clip(xi0, 0, w - 1)
        xi1c = jnp.clip(xi0 + 1, 0, w - 1)
        yi0c = jnp.clip(yi0, 0, h - 1)
        yi1c = jnp.clip(yi0 + 1, 0, h - 1)
        # out-of-range samples contribute 0 (CUDA op zeroes them)
        vx = (xs >= -1.0) & (xs <= w)
        vy = (ys >= -1.0) & (ys <= h)

        r0 = feat[yi0c]  # [P,W,C]
        r1 = feat[yi1c]
        f00 = r0[:, xi0c]  # [P,P,C]
        f01 = r0[:, xi1c]
        f10 = r1[:, xi0c]
        f11 = r1[:, xi1c]
        wx0 = (1.0 - fx)[None, :, None]
        wx1 = fx[None, :, None]
        wy0 = (1.0 - fy)[:, None, None]
        wy1 = fy[:, None, None]
        out = (f00 * wx0 + f01 * wx1) * wy0 + (f10 * wx0 + f11 * wx1) * wy1
        return out * (vy[:, None, None] & vx[None, :, None])

    sampled = jax.vmap(lambda xs, ys: bilinear(features, xs, ys))(sx, sy)
    # [N,P,P,C] -> average-pool s×s -> [N,out,out,C]
    out = sampled.reshape(n, output_size, s, output_size, s, c).mean(axis=(2, 4))
    return out


def assign_fpn_levels(
    boxes: jnp.ndarray, min_level: int = 2, max_level: int = 5
) -> jnp.ndarray:
    """[N,4] -> [N] int32 FPN level per box (FPN paper eq. 1, canonical
    level 4 at scale 224 — Detectron2 default)."""
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    scale = jnp.sqrt(w * h)
    lvl = jnp.floor(4.0 + jnp.log2(jnp.maximum(scale, 1e-6) / 224.0))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


class _SampleGeometry(NamedTuple):
    """Per-ROI sample geometry at each ROI's assigned FPN level."""

    lvl: jnp.ndarray  # [N] 0-based level index
    xi0c: jnp.ndarray  # [N,P] clipped left-corner col
    xi1c: jnp.ndarray  # [N,P] clipped right-corner col
    yi0c: jnp.ndarray  # [N,P] clipped top-corner row
    yi1c: jnp.ndarray  # [N,P]
    fx: jnp.ndarray  # [N,P] x fraction
    fy: jnp.ndarray  # [N,P]
    vx: jnp.ndarray  # [N,P] bool sample-in-range
    vy: jnp.ndarray  # [N,P]
    lh: jnp.ndarray  # [N] assigned-level height
    lw: jnp.ndarray  # [N]
    base: jnp.ndarray  # [N] flattened-pyramid offset of assigned level


def _sample_geometry(
    boxes: jnp.ndarray,
    heights: np.ndarray,
    widths: np.ndarray,
    strides: np.ndarray,
    output_size: int,
    sampling_ratio: int,
    adaptive_ratio: bool,
    fit_cells: float | None = None,
) -> _SampleGeometry:
    """Sample positions/corners/weights for every ROI at its assigned level
    (shared by the gather forward and the matmul backward — both must see
    byte-identical geometry).

    ``fit_cells``: when set, replicate the Pallas kernel's level bumping
    (kernels/roi_align_pallas.py:_prepare_rois): any box whose longest side
    exceeds ``stride * fit_cells`` at its sqrt-area level is bumped to the
    coarsest level that fits. The matmul backward paired with the Pallas
    FORWARD must pass this, or gradients for elongated boxes (bumped by the
    forward, unbumped here) would deposit into the wrong pyramid level."""
    s = sampling_ratio
    p = output_size * s
    offsets = np.concatenate([[0], np.cumsum(heights * widths)[:-1]]).astype(
        np.int32
    )

    lvl = assign_fpn_levels(boxes, 2, 2 + len(heights) - 1) - 2  # [N] 0-based
    if fit_cells is not None:
        # byte-identical to _prepare_rois' bump rule
        max_px = jnp.maximum(
            boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
        )
        lvl_fit = jnp.ceil(
            jnp.log2(
                jnp.maximum(max_px / (float(strides[0]) * fit_cells), 1e-6)
            )
        ).astype(jnp.int32)
        lvl = jnp.clip(jnp.maximum(lvl, lvl_fit), 0, len(strides) - 1)
    stride = jnp.asarray(strides)[lvl]  # [N]
    lh = jnp.asarray(heights)[lvl]
    lw = jnp.asarray(widths)[lvl]
    base = jnp.asarray(offsets)[lvl]

    scale = 1.0 / stride
    x0 = boxes[:, 0] * scale - 0.5
    y0 = boxes[:, 1] * scale - 0.5
    bw = (boxes[:, 2] - boxes[:, 0]) * scale
    bh = (boxes[:, 3] - boxes[:, 1]) * scale

    grid = (jnp.arange(p, dtype=jnp.float32) + 0.5) / p  # [P]
    if adaptive_ratio:
        # per-bin sample positions for a 1-sample grid: every sub-sample of
        # bin b sits at its center (b + 0.5)/out. Selecting this grid when
        # ceil(roi/out) <= 1 (i.e. roi <= out cells) matches the CUDA op's
        # adaptive rule exactly — duplicated samples average to the single
        # sample the reference takes.
        grid1 = (
            jnp.floor(jnp.arange(p, dtype=jnp.float32) / s) + 0.5
        ) / output_size  # [P]
        out_f = jnp.float32(output_size)
        sx = x0[:, None] + jnp.where(
            (bw <= out_f)[:, None], grid1[None, :], grid[None, :]
        ) * bw[:, None]
        sy = y0[:, None] + jnp.where(
            (bh <= out_f)[:, None], grid1[None, :], grid[None, :]
        ) * bh[:, None]
    else:
        sx = x0[:, None] + grid[None, :] * bw[:, None]  # [N,P]
        sy = y0[:, None] + grid[None, :] * bh[:, None]  # [N,P]

    xi0 = jnp.floor(sx).astype(jnp.int32)
    yi0 = jnp.floor(sy).astype(jnp.int32)
    return _SampleGeometry(
        lvl=lvl,
        xi0c=jnp.clip(xi0, 0, lw[:, None] - 1),
        xi1c=jnp.clip(xi0 + 1, 0, lw[:, None] - 1),
        yi0c=jnp.clip(yi0, 0, lh[:, None] - 1),
        yi1c=jnp.clip(yi0 + 1, 0, lh[:, None] - 1),
        fx=sx - xi0,
        fy=sy - yi0,
        vx=(sx >= -1.0) & (sx <= lw[:, None].astype(jnp.float32)),
        vy=(sy >= -1.0) & (sy <= lh[:, None].astype(jnp.float32)),
        lh=lh,
        lw=lw,
        base=base,
    )


def multilevel_roi_align(
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    levels: Sequence[str] = ("p2", "p3", "p4", "p5"),
    adaptive_ratio: bool = False,
) -> jnp.ndarray:
    """RoIAlign over FPN levels with per-box level assignment.

    features {level: [H,W,C]}, boxes [N,4] -> [N,out,out,C].

    ``adaptive_ratio=True`` reproduces the zoo-config ``ceil(roi/out)``
    per-axis sample count (see module docstring) within the static
    ``sampling_ratio``-sized grid by collapsing sub-samples when the
    adaptive rule wants fewer.

    Implementation: the whole pyramid is flattened to one [sum(Hi*Wi), C]
    table; each RoI computes flat indices into its assigned level (base
    offset + clamped integer coords) and the 4 bilinear corners of every
    sample point come from ONE gather of [N·P·P·4] rows. Memory traffic is
    exactly the sampled points — no per-level recompute, no row-wise
    gathers (an earlier row-gather formulation moved GBs per call and
    dominated the whole model's latency on TPU).
    """
    n = boxes.shape[0]
    s = sampling_ratio
    p = output_size * s
    c = features[levels[0]].shape[-1]

    # flattened pyramid + per-level geometry tables
    flat = jnp.concatenate(
        [features[name].reshape(-1, c) for name in levels], axis=0
    )
    heights = np.array([features[nm].shape[0] for nm in levels], np.int32)
    widths = np.array([features[nm].shape[1] for nm in levels], np.int32)
    strides = np.array([STRIDES[nm] for nm in levels], np.float32)

    g = _sample_geometry(
        boxes, heights, widths, strides, output_size, s, adaptive_ratio
    )
    xi0c, xi1c, yi0c, yi1c = g.xi0c, g.xi1c, g.yi0c, g.yi1c
    fx, fy, vx, vy, lw, base = g.fx, g.fy, g.vx, g.vy, g.lw, g.base

    def flat_idx(yy, xx):  # [N,P],[N,P] -> [N,P,P]
        return (
            base[:, None, None]
            + yy[:, :, None] * lw[:, None, None]
            + xx[:, None, :]
        )

    idx00 = flat_idx(yi0c, xi0c)
    idx01 = flat_idx(yi0c, xi1c)
    idx10 = flat_idx(yi1c, xi0c)
    idx11 = flat_idx(yi1c, xi1c)

    # Row order [N, out_y, out_x, sub_y, sub_x, corner]: every output bin's
    # s*s*4 contributions are CONTIGUOUS gather rows, so the weighted
    # bin-average is a grouped reduction over [N*out², s²*4, C] — 2-D-ish
    # layouts throughout. (The earlier [4,N,P,P,C] formulation forced a
    # physical relayout of the full gathered tensor — the sublane-padded
    # 14-sized dims cost ~150 ms per 4k image of pure data formatting.)
    idx4 = jnp.stack([idx00, idx01, idx10, idx11], axis=-1)  # [N,P,P,4]
    idx6 = idx4.reshape(n, output_size, s, output_size, s, 4)
    idx6 = jnp.transpose(idx6, (0, 1, 3, 2, 4, 5))
    rows = flat[idx6.reshape(-1)]  # [N*out²*s²*4, C]
    rows = rows.reshape(n * output_size * output_size, s * s * 4, c)

    wy0 = 1.0 - fy  # [N,P]
    wx0 = 1.0 - fx
    w4 = jnp.stack(
        [
            wy0[:, :, None] * wx0[:, None, :],
            wy0[:, :, None] * fx[:, None, :],
            fy[:, :, None] * wx0[:, None, :],
            fy[:, :, None] * fx[:, None, :],
        ],
        axis=-1,
    )  # [N,P,P,4] matching idx4's corner order
    w4 = w4 * (vy[:, :, None] & vx[:, None, :])[..., None]
    w6 = w4.reshape(n, output_size, s, output_size, s, 4)
    w6 = jnp.transpose(w6, (0, 1, 3, 2, 4, 5)).reshape(
        n * output_size * output_size, s * s * 4, 1
    )
    pooled = (rows * w6.astype(rows.dtype)).sum(axis=1) / (s * s)
    return pooled.reshape(n, output_size, output_size, c)


# ---------------------------------------------------------------------------
# Scatter-free backward (training hot path)
#
# Autodiff of the gather forward produces a scatter-add of N·P·P·4 rows into
# the feature pyramid, which XLA serializes on TPU: measured 116 ms for 576
# ROIs at 14² vs 16 ms forward (tools/bench_roi_grad.py) — the single
# largest line in the train step. RoIAlign is LINEAR in the features and the
# bilinear corner weights factor per axis, so the feature cotangent is
#
#   dF_l[h,w,c] = Σ_r Σ_{sy,sx} Wy[r,sy,h] · Wx[r,sx,w] · dS[r,sy,sx,c]
#
# with Wy/Wx the [P, level-extent] row/column interpolation matrices (two
# nonzeros per sample) and dS the per-sample share of the pooled cotangent.
# Evaluated DENSE per level as two chunked einsums this is pure MXU work —
# more FLOPs than the sparse scatter but two orders of magnitude faster on
# this hardware. Gradients w.r.t. BOX COORDINATES are defined as zero
# (Detectron2 semantics: proposals are detached before pooling; the training
# losses stop_gradient boxes explicitly).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _mra_fast_grad(
    features, boxes, output_size, sampling_ratio, levels, adaptive_ratio,
    shapes, fwd_backend,
):
    if fwd_backend in ("pallas", "pallas_full"):
        from deepemia_tpu.kernels.roi_align_pallas import roi_align_pallas

        out = roi_align_pallas(
            features,
            boxes,
            output_size=output_size,
            sampling_ratio=sampling_ratio,
            levels=levels,
            adaptive_ratio=adaptive_ratio,
            interpret=jax.default_backend() != "tpu",
        )
        # match the gather forward's output dtype so the custom_vjp cotangent
        # dtype lines up with the (possibly bf16) feature dtype
        return out.astype(features[levels[0]].dtype)
    return multilevel_roi_align(
        features,
        boxes,
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        levels=levels,
        adaptive_ratio=adaptive_ratio,
    )


def _mra_fg_fwd(
    features, boxes, output_size, sampling_ratio, levels, adaptive_ratio,
    shapes, fwd_backend,
):
    out = _mra_fast_grad(
        features, boxes, output_size, sampling_ratio, levels, adaptive_ratio,
        shapes, fwd_backend,
    )
    return out, (boxes,)


def _level_grad_chunked(dS, Wy, Wx, chunk: int = 64):
    """dF[h,w,c] = Σ_n Σ_{s,t} Wy[n,s,h]·Wx[n,t,w]·dS[n,s,t,c], chunked over
    n so the [n,h,t,c] intermediate stays ~tens of MB."""
    n, p, _, c = dS.shape
    pad = (-n) % chunk
    if pad:
        dS = jnp.pad(dS, ((0, pad), (0, 0), (0, 0), (0, 0)))
        Wy = jnp.pad(Wy, ((0, pad), (0, 0), (0, 0)))
        Wx = jnp.pad(Wx, ((0, pad), (0, 0), (0, 0)))
    nc = (n + pad) // chunk
    dS = dS.reshape(nc, chunk, p, p, c)
    Wy = Wy.reshape(nc, chunk, p, Wy.shape[-1])
    Wx = Wx.reshape(nc, chunk, p, Wx.shape[-1])

    def per_chunk(args):
        dSc, Wyc, Wxc = args
        a = jnp.einsum("nsh,nstc->nhtc", Wyc, dSc)
        return jnp.einsum("nhtc,ntw->hwc", a, Wxc)

    parts = jax.lax.map(per_chunk, (dS, Wy, Wx))  # [nc,H,W,C]
    return parts.astype(jnp.float32).sum(axis=0)


def _mra_fg_bwd(
    output_size, sampling_ratio, levels, adaptive_ratio, shapes, fwd_backend,
    res, g,
):
    (boxes,) = res
    if fwd_backend == "pallas_full":
        # EXPERIMENTAL windowed RMW accumulation kernel: each RoI's
        # dW = Wyᵀ·dS·Wx is added straight into its forward window — no
        # [chunk,H,P,C] HBM intermediates, and the SAME _prepare_rois
        # geometry as the Pallas forward (incl. coarser-level bumping),
        # making the pair a true adjoint. NOT the default: its Mosaic
        # compile is pathological (>20 min even in isolation at train
        # shapes, vs ~1 min for the einsum program), and the production
        # loop is transfer-bound, so the ~5 ms/step runtime win never
        # reaches the recorded benchmark. Revisit if Mosaic compile of
        # chunked in-place updates improves.
        from deepemia_tpu.kernels.roi_align_pallas import (
            roi_align_backward_pallas,
        )

        dfeats = roi_align_backward_pallas(
            g,
            boxes,
            [sh[:2] for sh in shapes],
            output_size=output_size,
            sampling_ratio=sampling_ratio,
            levels=levels,
            adaptive_ratio=adaptive_ratio,
            interpret=jax.default_backend() != "tpu",
        )
        return (
            {nm: dfeats[nm].astype(g.dtype) for nm in levels},
            jnp.zeros_like(boxes),
        )
    n = boxes.shape[0]
    s = sampling_ratio
    p = output_size * s
    c = g.shape[-1]
    heights = np.array([sh[0] for sh in shapes], np.int32)
    widths = np.array([sh[1] for sh in shapes], np.int32)
    strides = np.array([STRIDES[nm] for nm in levels], np.float32)
    fit_cells = None
    if fwd_backend == "pallas":
        # the Pallas forward bumps oversized boxes to coarser levels; the
        # backward must mirror that or it is not the forward's adjoint
        from deepemia_tpu.kernels.roi_align_pallas import LARGE_W

        fit_cells = float(LARGE_W - 2)
    geom = _sample_geometry(
        boxes, heights, widths, strides, output_size, s, adaptive_ratio,
        fit_cells=fit_cells,
    )

    # per-sample cotangent share: every sub-sample of bin (i,j) gets g/s²
    dS = jnp.broadcast_to(
        g[:, :, None, :, None, :] / (s * s),
        (n, output_size, s, output_size, s, c),
    ).reshape(n, p, p, c)

    wy0 = ((1.0 - geom.fy) * geom.vy).astype(g.dtype)  # [N,P]
    wy1 = (geom.fy * geom.vy).astype(g.dtype)
    wx0 = ((1.0 - geom.fx) * geom.vx).astype(g.dtype)
    wx1 = (geom.fx * geom.vx).astype(g.dtype)

    dfeats = {}
    for li, nm in enumerate(levels):
        lh, lw = int(heights[li]), int(widths[li])
        sel = (geom.lvl == li).astype(g.dtype)[:, None, None]
        rows = jnp.arange(lh, dtype=jnp.int32)
        cols = jnp.arange(lw, dtype=jnp.int32)
        # [N,P,lh]: two (possibly coincident at borders) nonzeros per sample
        Wy = (
            (geom.yi0c[:, :, None] == rows) * wy0[:, :, None]
            + (geom.yi1c[:, :, None] == rows) * wy1[:, :, None]
        ) * sel
        Wx = (
            (geom.xi0c[:, :, None] == cols) * wx0[:, :, None]
            + (geom.xi1c[:, :, None] == cols) * wx1[:, :, None]
        ) * sel
        dfeats[nm] = _level_grad_chunked(dS, Wy, Wx).astype(g.dtype)
    return dfeats, jnp.zeros_like(boxes)


_mra_fast_grad.defvjp(_mra_fg_fwd, _mra_fg_bwd)


def multilevel_roi_align_fast_grad(
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    levels: Sequence[str] = ("p2", "p3", "p4", "p5"),
    adaptive_ratio: bool = False,
    fwd_backend: str = "xla",
) -> jnp.ndarray:
    """``multilevel_roi_align`` with the scatter-free matmul backward.

    Identical forward; d(features) computed as dense per-level einsums;
    d(boxes) is ZERO by definition (see block comment above). Use on any
    differentiated path — the training losses route here.

    ``fwd_backend='pallas'`` runs the window-DMA kernel as the forward
    (same semantics; the custom_vjp boundary means the kernel is never
    differentiated — the matmul backward serves both forwards).
    """
    levels = tuple(nm for nm in levels if nm in features)
    shapes = tuple(tuple(int(d) for d in features[nm].shape) for nm in levels)
    # pass ONLY the pooled levels as the differentiated input: the backward
    # returns cotangents keyed by `levels`, so an extra entry (p6 from
    # MaskRCNN.features()) would be a custom_vjp pytree mismatch under grad
    return _mra_fast_grad(
        {nm: features[nm] for nm in levels}, boxes, output_size,
        sampling_ratio, levels, adaptive_ratio, shapes, fwd_backend,
    )


# Pallas kernel coverage: the LARGE window covers boxes up to LARGE_W-2=70
# cells on the coarsest level (p5, stride 32) => boxes/tiles up to 70*32 =
# 2240 px pool exactly (kernels/roi_align_pallas.py:_prepare_rois bumps
# oversized boxes to coarser levels but cannot bump past p5). Images that
# could contain bigger boxes fall back to the XLA gather in dispatch.
_PALLAS_MAX_IMAGE = 70 * 32


def _pallas_image_extent(features: Dict[str, jnp.ndarray]) -> int:
    """Largest box extent (px) the feature shapes allow — the finest level's
    spatial size times its stride. Compared against _PALLAS_MAX_IMAGE to
    decide whether the Pallas kernel's LARGE window can cover every box."""
    finest = features[min(features, key=lambda k: STRIDES.get(k, 99))]
    return max(finest.shape[0], finest.shape[1]) * min(
        STRIDES[k] for k in features if k in STRIDES
    )


def roi_align_dispatch(
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    adaptive_ratio: bool = False,
    backend: str = "auto",
    valid=None,
) -> jnp.ndarray:
    """Multilevel RoIAlign with backend selection.

    ``valid``: optional [N] bool row mask, honored by the Pallas inference
    backend only — invalid rows skip their window DMA/compute and output
    zeros (the RoI heads gate on validity downstream, so only the padded
    rows' garbage values change). The XLA/gather and training backends
    ignore it.

    ``backend``: 'xla' (pyramid point-gather — differentiable, and the
    default), 'xla_fast_grad' (same forward, scatter-free matmul backward,
    zero box gradients — the training path), 'pallas' (window-DMA kernel;
    interpret mode off-TPU), or 'auto' (currently resolves to xla).

    Status of the Pallas kernel (kernels/roi_align_pallas.py): in
    ISOLATION it beats the gather 1.8x (box stage) / 3.0x (mask stage) on
    a v5e chip — the gather is descriptor-bound at ~94 GB/s. Inside the
    full single-tile model, however, feeding batch-1 FPN conv outputs into
    a Mosaic custom call suppresses XLA's space-to-batch conv rewrite and
    the backbone convs slow ~3x, outweighing the kernel's win (measured:
    76.6 -> 63.7 tiles/s even with the best boundary op). 'auto' therefore
    stays on the gather until the conv interaction is resolved; 'pallas'
    remains available for explicit use and benchmarking.
    """
    import jax as _jax

    if backend in ("xla_fast_grad", "pallas_fast_grad", "pallas_full_fast_grad"):
        fwd = "xla"
        if backend != "xla_fast_grad":
            # same size guard as the inference pallas path below
            if _pallas_image_extent(features) <= _PALLAS_MAX_IMAGE:
                fwd = (
                    "pallas_full"
                    if backend == "pallas_full_fast_grad"
                    else "pallas"
                )
        return multilevel_roi_align_fast_grad(
            features,
            boxes,
            output_size=output_size,
            sampling_ratio=sampling_ratio,
            adaptive_ratio=adaptive_ratio,
            fwd_backend=fwd,
        )
    on_tpu = _jax.default_backend() == "tpu"
    use_pallas = backend == "pallas"
    if use_pallas:
        # Size guard (ADVICE r2): the kernel's LARGE window cannot cover a
        # box wider than _PALLAS_MAX_IMAGE px even after level bumping — a
        # bigger box would silently lose sample contributions outside the
        # window. Feature shapes bound the largest possible box, so route
        # oversized images to the exact gather.
        if _pallas_image_extent(features) > _PALLAS_MAX_IMAGE:
            use_pallas = False
    if use_pallas:
        from deepemia_tpu.kernels.roi_align_pallas import roi_align_pallas

        return roi_align_pallas(
            features,
            boxes,
            output_size=output_size,
            sampling_ratio=sampling_ratio,
            adaptive_ratio=adaptive_ratio,
            interpret=not on_tpu,
            valid=valid,
        )
    return multilevel_roi_align(
        features,
        boxes,
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        adaptive_ratio=adaptive_ratio,
    )
