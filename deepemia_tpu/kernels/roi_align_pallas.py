"""Pallas TPU RoIAlign: adaptive-window DMA + MXU interpolation matmuls.

The production RoIAlign hot path, replacing the XLA pyramid point-gather of
models/roi_align.py on TPU. The gather is descriptor-bound: 4 corner rows per
sample point = 784 gathered rows per box-stage RoI (ROUND1_NOTES #2 measured
~94 GB/s effective — far below HBM peak). This kernel instead moves each
RoI's *rectangular cell window* with ONE async copy and reconstructs the
bilinear sampling as two small interpolation matmuls on the MXU:

  * FPN features are consumed as native 3-D ``[H, W, C]`` HBM buffers — the
    layout conv producers already emit, so no relayout sits in front of the
    kernel (a 2-D ``[H, W*C]`` reshape costs a full feature relayout per
    call, ~44 MB/tile); the W axis carries the DMA alignment slack;
  * three window classes, picked per RoI at runtime from its cell extent at
    the assigned level: SMALL 16 (boxes <= 14 cells), MEDIUM 32 (<= 30
    cells — the FPN assignment rule lands square-ish boxes at 14-28 cells,
    so this is the bulk), LARGE 80 (level-5 / elongated boxes; anything
    bigger is bumped to a coarser level first);
  * SMALL and MEDIUM windows are double-buffered: RoI i+1's copy is issued
    before RoI i's compute, so DMA rides under the matmuls;
  * bilinear sampling = tent-kernel row matrix [P, WY] x window [WY, WX, C]
    on the MXU, then a column matrix [P, WX] contraction — out-of-level
    samples get zero weight and off-edge weight accumulates onto the edge
    cell, matching the CUDA op's clamp semantics;
  * the zoo configs' POOLER_SAMPLING_RATIO=0 (adaptive ceil(roi/out)
    samples per bin) is emulated exactly for adaptive grids of 1 by
    collapsing sub-sample positions per axis (same rule as
    models/roi_align.py ``adaptive_ratio``).

Replaces Detectron2's CUDA ``ROIAlign`` (implicit in every reference
``predictor(image)`` call, e.g. /root/reference/src/functions/
inference.py:2107).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepemia_tpu.models.anchors import STRIDES

# window y-extents in cells (x-extent = y-extent + alignment quantum)
SMALL_W = 16
MED_W = 32
LARGE_W = 72  # covers boxes to ~70 cells => full-image boxes to ~2240 px at
# p5; TileEngine inputs are <= 2048 px so production boxes always fit.
# (80 would cover 2528 px but overflows the 16 MB VMEM budget at f32.)


def _align_quantum(dtype) -> int:
    """Sublane alignment for DMA offsets on the tiled (W) axis."""
    return 16 if dtype == jnp.bfloat16 else 8


def _prepare_rois(
    boxes, level_shapes, strides, output_size, sampling_ratio, adaptive, q
):
    """Host/JAX-side per-RoI geometry.

    Returns int arrays (cls, level, wy, wx, heights, widths) and a float
    geometry matrix [N, 6]: sy0, sx0, step_y, step_x, collapse_y, collapse_x
    (sample start/step in assigned-level cell coordinates; collapse flags
    implement the adaptive-sampling-ratio rule).
    """
    from deepemia_tpu.models.roi_align import assign_fpn_levels

    p = output_size * sampling_ratio

    lvl = assign_fpn_levels(boxes) - 2  # [N] 0..3
    # bump boxes that cannot fit even the LARGE window to a coarser level
    max_px = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    fit_cells = float(LARGE_W - 2)
    base_stride = float(strides[0])
    lvl_fit = jnp.ceil(
        jnp.log2(jnp.maximum(max_px / (base_stride * fit_cells), 1e-6))
    ).astype(jnp.int32)
    lvl = jnp.clip(jnp.maximum(lvl, lvl_fit), 0, len(strides) - 1)
    stride = jnp.asarray(strides, jnp.float32)[lvl]
    heights = jnp.asarray([s[0] for s in level_shapes], jnp.int32)[lvl]
    widths = jnp.asarray([s[1] for s in level_shapes], jnp.int32)[lvl]

    scale = 1.0 / stride
    x0 = boxes[:, 0] * scale - 0.5
    y0 = boxes[:, 1] * scale - 0.5
    bw = (boxes[:, 2] - boxes[:, 0]) * scale
    bh = (boxes[:, 3] - boxes[:, 1]) * scale

    out_f = jnp.float32(output_size)
    if adaptive:
        collapse_x = (bw <= out_f).astype(jnp.float32)
        collapse_y = (bh <= out_f).astype(jnp.float32)
    else:
        collapse_x = jnp.zeros_like(bw)
        collapse_y = jnp.zeros_like(bh)
    # fixed grid: sample k at (k+0.5)/p along the box; collapsed grid:
    # sub-samples sit at their bin center (k//s + 0.5)/out
    sx0 = jnp.where(collapse_x > 0, x0 + 0.5 * bw / out_f, x0 + 0.5 * bw / p)
    sy0 = jnp.where(collapse_y > 0, y0 + 0.5 * bh / out_f, y0 + 0.5 * bh / p)
    step_x = jnp.where(collapse_x > 0, bw / out_f, bw / p)
    step_y = jnp.where(collapse_y > 0, bh / out_f, bh / p)

    ext = jnp.maximum(bw, bh)
    cls = jnp.where(
        ext <= SMALL_W - 2.0, 0, jnp.where(ext <= MED_W - 2.0, 1, 2)
    ).astype(jnp.int32)
    wy_cap = jnp.where(cls == 0, SMALL_W, jnp.where(cls == 1, MED_W, LARGE_W))
    wx_cap = wy_cap + q
    wy = jnp.clip(
        jnp.floor(sy0).astype(jnp.int32), 0, jnp.maximum(heights - wy_cap, 0)
    )
    wx = jnp.clip(
        jnp.floor(sx0).astype(jnp.int32), 0, jnp.maximum(widths - wx_cap, 0)
    )
    wx = (wx // q) * q  # W is the tiled (sublane) axis: align its offset
    geom = jnp.stack([sy0, sx0, step_y, step_x, collapse_y, collapse_x], axis=1)
    return cls, lvl.astype(jnp.int32), wy, wx, heights, widths, geom


def _weight_matrices(wy, wx, lh, lw, geom_ref, i, p, s, wy_cells, wx_cells):
    """Per-RoI bilinear interpolation matrices over the VMEM window.

    Returns (wy_mat [P, wy_cells], wx_mat [P, wx_cells]) in f32 — the tent
    (bilinear) kernels with the CUDA op's clamp semantics: weight falling
    off the LEVEL edge accumulates onto the edge cell; samples beyond
    [-1, size] zero out. Shared by the forward sampling kernel and the
    backward accumulation kernel — both must see byte-identical weights
    for the custom_vjp pair to be a true adjoint.
    """
    sy0 = geom_ref[i, 0]
    sx0 = geom_ref[i, 1]
    step_y = geom_ref[i, 2]
    step_x = geom_ref[i, 3]
    coll_y = geom_ref[i, 4]
    coll_x = geom_ref[i, 5]

    k = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    kf = k.astype(jnp.float32)
    kc = (k // s).astype(jnp.float32)  # collapsed (adaptive grid of 1)
    ky = jnp.where(coll_y > 0, kc, kf)
    kx = jnp.where(coll_x > 0, kc, kf)
    sy = sy0 - wy.astype(jnp.float32) + ky * step_y  # window-local cells
    sx = sx0 - wx.astype(jnp.float32) + kx * step_x

    cells_y = jax.lax.broadcasted_iota(
        jnp.int32, (p, wy_cells), 1
    ).astype(jnp.float32)
    cells_x = jax.lax.broadcasted_iota(
        jnp.int32, (p, wx_cells), 1
    ).astype(jnp.float32)
    fy = sy[:, None] - cells_y
    fx = sx[:, None] - cells_x
    wy_mat = jnp.clip(1.0 - jnp.abs(fy), 0.0, 1.0)  # tent = bilinear
    wx_mat = jnp.clip(1.0 - jnp.abs(fx), 0.0, 1.0)
    lastf_y = jnp.minimum(lh - wy, wy_cells).astype(jnp.float32) - 1.0
    lastf_x = jnp.minimum(lw - wx, wx_cells).astype(jnp.float32) - 1.0
    first_y = cells_y == 0.0
    first_x = cells_x == 0.0
    last_y = cells_y == lastf_y
    last_x = cells_x == lastf_x
    wy_mat = wy_mat + first_y * jnp.clip(-sy, 0.0, 1.0)[:, None]
    wx_mat = wx_mat + first_x * jnp.clip(-sx, 0.0, 1.0)[:, None]
    wy_mat = wy_mat + last_y * jnp.clip(sy[:, None] - lastf_y, 0.0, 1.0)
    wx_mat = wx_mat + last_x * jnp.clip(sx[:, None] - lastf_x, 0.0, 1.0)
    in_y = cells_y <= lastf_y
    in_x = cells_x <= lastf_x
    ly = sy + wy.astype(jnp.float32)
    lx = sx + wx.astype(jnp.float32)
    vy = ((ly >= -1.0) & (ly <= lh.astype(jnp.float32)))[:, None]
    vx = ((lx >= -1.0) & (lx <= lw.astype(jnp.float32)))[:, None]
    return wy_mat * vy * in_y, (wx_mat * vx * in_x).astype(jnp.float32)


def _kernel(
    # scalar prefetch
    cls_ref, lvl_ref, wy_ref, wx_ref, h_ref, w_ref,
    # vector inputs
    geom_ref,  # [N, 6] f32 (VMEM)
    f0, f1, f2, f3,  # per-level [H, W, C] HBM refs
    out_ref,  # [K, P, P*C] VMEM block for this RoI group
    # scratch: flat per-(slot, lane) small/medium window buffers (3-D VMEM
    # refs — a single [2, K, ...] buffer sliced per access lowers to
    # per-access relayout copies in Mosaic), then one large window and the
    # [2, K] semaphore arrays
    *scratch,
    p: int, c: int, out_size: int, s: int, q: int, k: int,
):
    """Grid step i processes RoIs [i*k, (i+1)*k): one grid step per RoI is
    dominated by fixed per-step cost (scalar reads, branch setup, DMA
    issue/wait latency — measured ~3.3 us/RoI at the 1000x7 box stage while
    the window DMA+matmuls are sub-microsecond), so k RoIs share a step and
    the whole NEXT group's windows prefetch while this group computes."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    levels = (f0, f1, f2, f3)
    # scratch layout: 2*k small, 2*k medium (slot-major), large, sems
    s_bufs = [scratch[sl * k + j] for sl in range(2) for j in range(k)]
    m_bufs = [scratch[2 * k + sl * k + j] for sl in range(2) for j in range(k)]
    large_win = scratch[4 * k]
    sem_s, sem_m, sem_l = scratch[4 * k + 1 :]

    def s_win(sl, j):
        return s_bufs[sl * k + j]

    def m_win(sl, j):
        return m_bufs[sl * k + j]

    def make_copy(ref, r, dst, sem, wy_cells, wx_cells):
        return pltpu.make_async_copy(
            ref.at[
                pl.ds(wy_ref[r], wy_cells),
                pl.ds(pl.multiple_of(wx_ref[r], q), wx_cells),
                slice(None),
            ],
            dst,
            sem,
        )

    def start(r, dst, sem, wy_cells, wx_cells):
        for li, ref in enumerate(levels):
            @pl.when(lvl_ref[r] == li)
            def _(ref=ref):
                make_copy(ref, r, dst, sem, wy_cells, wx_cells).start()

    def issue(r, slot, j):
        """Issue RoI r's window DMA into lane j of its class buffer group
        (small/medium are slotted; large has one buffer)."""
        @pl.when(cls_ref[r] == 0)
        def _():
            @pl.when(slot == 0)
            def _():
                start(r, s_win(0, j), sem_s.at[0, j], SMALL_W, SMALL_W + q)

            @pl.when(slot == 1)
            def _():
                start(r, s_win(1, j), sem_s.at[1, j], SMALL_W, SMALL_W + q)

        @pl.when(cls_ref[r] == 1)
        def _():
            @pl.when(slot == 0)
            def _():
                start(r, m_win(0, j), sem_m.at[0, j], MED_W, MED_W + q)

            @pl.when(slot == 1)
            def _():
                start(r, m_win(1, j), sem_m.at[1, j], MED_W, MED_W + q)

    # prologue: issue group 0's small/medium windows into slot 0
    @pl.when(i == 0)
    def _():
        for j in range(k):
            issue(jnp.int32(j), jnp.int32(0), j)

    # prefetch the NEXT group's small/medium windows before this group's
    # compute (indices clamped: the guard keeps the branch dead at the last
    # step, but the scalar reads themselves must stay in bounds)
    @pl.when(i + 1 < nprog)
    def _():
        for j in range(k):
            nxt = jnp.minimum((i + 1) * k + j, nprog * k - 1)

            @pl.when(cls_ref[nxt] != 2)
            def _(nxt=nxt):
                issue(nxt, (i + 1) % 2, j)

    def compute(r, j, win_ref, wy_cells, wx_cells):
        """Bilinear sampling of RoI r from its VMEM window into lane j."""
        wy_mat, wx_mat = _weight_matrices(
            wy_ref[r], wx_ref[r], h_ref[r], w_ref[r], geom_ref, r,
            p, s, wy_cells, wx_cells,
        )
        wy_mat = wy_mat.astype(win_ref.dtype)

        # rows: [P, WY] x window [WY, WX, C] -> [P, WX, C] (f32 accumulate)
        rowmix = jax.lax.dot_general(
            wy_mat,
            win_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # columns: samples[jx, iy, ch] = sum_w wx_mat[jx, w] rowmix[iy, w, ch]
        samples = jax.lax.dot_general(
            wx_mat,
            rowmix,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P_x, P_y, C]
        samples = jnp.transpose(samples, (1, 0, 2))  # [P_y, P_x, C]
        pooled = samples.reshape(out_size, s, out_size, s, c).mean(axis=(1, 3))
        out_ref[j] = pooled.reshape(out_size, out_size * c).astype(
            out_ref.dtype
        )

    for j in range(k):
        r = i * k + j

        @pl.when(cls_ref[r] == 0)
        def _(r=r, j=j):
            @pl.when(i % 2 == 0)
            def _():
                make_copy(
                    f0, r, s_win(0, j), sem_s.at[0, j], SMALL_W, SMALL_W + q
                ).wait()
                compute(r, j, s_win(0, j), SMALL_W, SMALL_W + q)

            @pl.when(i % 2 == 1)
            def _():
                make_copy(
                    f0, r, s_win(1, j), sem_s.at[1, j], SMALL_W, SMALL_W + q
                ).wait()
                compute(r, j, s_win(1, j), SMALL_W, SMALL_W + q)

        @pl.when(cls_ref[r] == 1)
        def _(r=r, j=j):
            @pl.when(i % 2 == 0)
            def _():
                make_copy(
                    f0, r, m_win(0, j), sem_m.at[0, j], MED_W, MED_W + q
                ).wait()
                compute(r, j, m_win(0, j), MED_W, MED_W + q)

            @pl.when(i % 2 == 1)
            def _():
                make_copy(
                    f0, r, m_win(1, j), sem_m.at[1, j], MED_W, MED_W + q
                ).wait()
                compute(r, j, m_win(1, j), MED_W, MED_W + q)

        @pl.when(cls_ref[r] == 2)
        def _(r=r, j=j):
            # large windows are rare (level-5/elongated): serial single
            # buffer, issued inline
            start(r, large_win, sem_l, LARGE_W, LARGE_W + q)
            make_copy(f0, r, large_win, sem_l, LARGE_W, LARGE_W + q).wait()
            compute(r, j, large_win, LARGE_W, LARGE_W + q)

        @pl.when(cls_ref[r] == 3)
        def _(j=j):
            # skip class: invalid/padding RoI — no DMA, no matmuls. The
            # production proposal set is half padding rows (post-NMS top-K
            # at a fixed 1000), so this halves the kernel's HBM traffic.
            out_ref[j] = jnp.zeros(
                (out_size, out_size * c), out_ref.dtype
            )


def roi_align_pallas(
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    levels: Sequence[str] = ("p2", "p3", "p4", "p5"),
    adaptive_ratio: bool = False,
    interpret: bool = False,
    rois_per_step: int = 0,
    valid=None,
) -> jnp.ndarray:
    """Drop-in multilevel RoIAlign via the Pallas kernel.

    features {level: [H,W,C]}, boxes [N,4] -> [N,out,out,C] float32.

    ``valid``: optional [N] bool — rows marked False skip the window DMA
    and compute entirely and output zeros. Callers that mask invalid rows
    downstream (the RoI heads gate on proposal/detection validity) get the
    bandwidth back: the kernel is HBM-bound on its window copies and the
    production proposal set is half padding rows.

    ``rois_per_step``: RoIs per Mosaic grid step (0 = auto = 1). Grouping
    K windows per step was measured SLOWER on v5e (2.4 -> 10.0 ms at the
    1000x7 box stage with a realistic window mix): the kernel is
    DMA-bandwidth-bound, not per-step-overhead-bound, and larger in-flight
    window groups just add VMEM pressure. The knob stays for experiments
    (tools/bench_roi.py --roi-k).
    """
    n = boxes.shape[0]
    c = features[levels[0]].shape[-1]
    p = output_size * sampling_ratio
    # Boundary op: when batch-1 FPN conv outputs feed this custom call
    # directly, XLA's space-to-batch conv rewrite bails and the
    # feature-producing convs run ~5x slower (measured +7 ms/tile; an
    # optimization_barrier, a convert, or an identity row-gather do not
    # stop the poisoning — the pass inspects transitive consumers). An
    # identity 1x1 conv is the best boundary found (recovers ~10 tiles/s
    # of the regression); batch>1 forwards (vmapped tile batches) do not
    # need space-to-batch at all and avoid the issue entirely.
    c_feat = features[levels[0]].shape[-1]
    eye = jnp.eye(c_feat, dtype=features[levels[0]].dtype).reshape(
        1, 1, c_feat, c_feat
    )
    features = {
        k: jax.lax.conv_general_dilated(
            v[None], eye, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
        for k, v in features.items()
    }
    dtype = features[levels[0]].dtype
    q = _align_quantum(dtype)
    k = max(1, min(rois_per_step or 1, n))
    level_shapes = [features[nm].shape[:2] for nm in levels]
    strides = [STRIDES[nm] for nm in levels]
    cls, lvl, wy, wx, heights, widths, geom = _prepare_rois(
        boxes, level_shapes, strides, output_size, sampling_ratio,
        adaptive_ratio, q,
    )
    if valid is not None:
        cls = jnp.where(jnp.asarray(valid, bool), cls, 3)
    # pad the RoI axis to a group multiple (pad RoIs are skip-class:
    # no DMA/compute, output rows sliced off)
    n_pad = -(-n // k) * k
    if n_pad != n:
        ext = n_pad - n
        cls = jnp.pad(cls, (0, ext), constant_values=3)
        lvl = jnp.pad(lvl, (0, ext))
        wy = jnp.pad(wy, (0, ext))
        wx = jnp.pad(wx, (0, ext))
        heights = jnp.pad(heights, (0, ext), constant_values=SMALL_W)
        widths = jnp.pad(widths, (0, ext), constant_values=SMALL_W + q)
        geom = jnp.pad(geom, ((0, ext), (0, 0)))

    # pad small levels so any clamped window slice stays in bounds (only
    # p4/p5-sized maps are touched; p2/p3 pass through with their native
    # conv-output layout — no relayout, no copy)
    padded = []
    for nm in levels:
        f = features[nm]
        h, w, _ = f.shape
        ph = max(LARGE_W - h, 0)
        pw = max(LARGE_W + q - w, 0)
        if ph or pw:
            f = jnp.pad(f, ((0, ph), (0, pw), (0, 0)))
        padded.append(f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_pad // k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom
            pl.BlockSpec(memory_space=pl.ANY),  # f0 (HBM)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (k, output_size, output_size * c),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [pltpu.VMEM((SMALL_W, SMALL_W + q, c), dtype)] * (2 * k)
            + [pltpu.VMEM((MED_W, MED_W + q, c), dtype)] * (2 * k)
            + [
                pltpu.VMEM((LARGE_W, LARGE_W + q, c), dtype),
                pltpu.SemaphoreType.DMA((2, k)),
                pltpu.SemaphoreType.DMA((2, k)),
                pltpu.SemaphoreType.DMA,
            ]
        ),
    )

    kernel = functools.partial(
        _kernel, p=p, c=c, out_size=output_size, s=sampling_ratio, q=q, k=k
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, output_size, output_size * c), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cls, lvl, wy, wx, heights, widths, geom, *padded)
    return out[:n].reshape(n, output_size, output_size, c)


# ---------------------------------------------------------------------------
# Windowed backward: per-RoI read-modify-write accumulation
#
# The scatter-free matmul backward (models/roi_align.py:_level_grad_chunked)
# is exact but dense: it materializes a [chunk, H, P, C] intermediate per
# level in HBM (~58 MB/chunk at p2/512²) and runs level-extent einsums for
# EVERY RoI at EVERY level (masked) — measured ~8 ms of the 41.5 ms train
# step, HBM-bound. Each RoI's cotangent only touches its forward window, so
# this kernel accumulates dW = Wyᵀ·dS·Wx windows directly into per-level
# f32 buffers: DMA the window in, add, DMA it back. The TPU grid executes
# sequentially, so overlapping windows never race; both DMAs are awaited
# in-step (correctness over overlap — the windows are small).
# ---------------------------------------------------------------------------


def _bwd_kernel(
    # scalar prefetch
    cls_ref, lvl_ref, wy_ref, wx_ref, h_ref, w_ref,
    # vector inputs
    geom_ref,  # [N, 6] f32 (VMEM)
    g_ref,  # [1, out, out*C] VMEM block: this RoI's pooled cotangent
    a0, a1, a2, a3,  # per-level [H, W, C] f32 accumulators (HBM, aliased)
    o0, o1, o2, o3,  # aliased outputs of a0..a3 (same buffers)
    # scratch
    win_s, win_m, win_l, sem_in, sem_out,
    *, p: int, c: int, out_size: int, s: int, q: int,
):
    i = pl.program_id(0)
    outs = (o0, o1, o2, o3)

    def rmw(win, wy_cells, wx_cells):
        """win <- level[window] + dW; level[window] <- win."""
        wy_mat, wx_mat = _weight_matrices(
            wy_ref[i], wx_ref[i], h_ref[i], w_ref[i], geom_ref, i,
            p, s, wy_cells, wx_cells,
        )
        # per-sample cotangent share: pooled mean over the s x s sub-grid
        g = g_ref[...].reshape(out_size, out_size, c).astype(jnp.float32)
        ds = jnp.broadcast_to(
            g[:, None, :, None, :] / (s * s),
            (out_size, s, out_size, s, c),
        ).reshape(p, p, c)
        # dW[wy, wx, c] = sum_iy sum_jx Wy[iy,wy] Wx[jx,wx] dS[iy,jx,c]
        tmp = jax.lax.dot_general(
            wy_mat, ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [WY, P(jx), C]

        def win_slice(ref, j):
            return ref.at[
                pl.ds(wy_ref[j], wy_cells),
                pl.ds(pl.multiple_of(wx_ref[j], q), wx_cells),
                slice(None),
            ]

        # accumulate dW into the window in row chunks: a full [WY, WX, C]
        # f32 dW for the LARGE window is 5.6 MB at C=256, which together
        # with the window scratch overflows the 16 MB scoped-VMEM budget
        # at the mask stage (P=28). Row-chunking keeps the live dW slice
        # at ~2 MB; SMALL/MEDIUM fit in one chunk.
        rows = min(wy_cells, MED_W)

        def add_dw(win_ref_):
            for r0 in range(0, wy_cells, rows):
                nr = min(rows, wy_cells - r0)
                dwc = jax.lax.dot_general(
                    wx_mat, tmp[r0 : r0 + nr], (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [WX, nr, C]
                win_ref_[r0 : r0 + nr] = win_ref_[
                    r0 : r0 + nr
                ] + jnp.transpose(dwc, (1, 0, 2))

        for li, oref in enumerate(outs):
            @pl.when(lvl_ref[i] == li)
            def _(oref=oref):
                pltpu.make_async_copy(
                    win_slice(oref, i), win, sem_in
                ).wait()  # issued below/in the prologue
                add_dw(win)
                cp = pltpu.make_async_copy(win, win_slice(oref, i), sem_out)
                cp.start()
                cp.wait()

    def issue_in(j, win, wy_cells, wx_cells):
        for li, oref in enumerate(outs):
            @pl.when(lvl_ref[j] == li)
            def _(oref=oref):
                pltpu.make_async_copy(
                    oref.at[
                        pl.ds(wy_ref[j], wy_cells),
                        pl.ds(pl.multiple_of(wx_ref[j], q), wx_cells),
                        slice(None),
                    ],
                    win,
                    sem_in,
                ).start()

    def issue_for(j):
        @pl.when(cls_ref[j] == 0)
        def _():
            issue_in(j, win_s, SMALL_W, SMALL_W + q)

        @pl.when(cls_ref[j] == 1)
        def _():
            issue_in(j, win_m, MED_W, MED_W + q)

        @pl.when(cls_ref[j] == 2)
        def _():
            issue_in(j, win_l, LARGE_W, LARGE_W + q)

    # The RMW dependency chain forces full serialization per RoI (the next
    # read may overlap this write), so the copy-in is issued right here.
    issue_for(i)

    @pl.when(cls_ref[i] == 0)
    def _():
        rmw(win_s, SMALL_W, SMALL_W + q)

    @pl.when(cls_ref[i] == 1)
    def _():
        rmw(win_m, MED_W, MED_W + q)

    @pl.when(cls_ref[i] == 2)
    def _():
        rmw(win_l, LARGE_W, LARGE_W + q)


def roi_align_backward_pallas(
    g: jnp.ndarray,
    boxes: jnp.ndarray,
    level_shapes: Sequence,
    output_size: int = 7,
    sampling_ratio: int = 2,
    levels: Sequence[str] = ("p2", "p3", "p4", "p5"),
    adaptive_ratio: bool = False,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """d(features) of ``roi_align_pallas`` as windowed RMW accumulation.

    g [N, out, out, C] pooled cotangent, boxes [N,4] ->
    {level: [H, W, C] float32} feature cotangents. Uses the SAME
    _prepare_rois geometry as the forward kernel (including coarser-level
    bumping of oversized boxes), so the pair is a true adjoint — unlike the
    dense einsum backward, which assigns gradients at the unbumped level.
    """
    n, out_sz = g.shape[0], g.shape[1]
    c = g.shape[-1]
    p = out_sz * sampling_ratio
    q = _align_quantum(jnp.float32)
    strides = [STRIDES[nm] for nm in levels]
    cls, lvl, wy, wx, heights, widths, geom = _prepare_rois(
        boxes, list(level_shapes), strides, out_sz, sampling_ratio,
        adaptive_ratio, q,
    )

    # zero f32 accumulators, padded so any clamped window stays in bounds
    accs = []
    pads = []
    for (h, w) in level_shapes:
        ph = max(LARGE_W - h, 0)
        pw = max(LARGE_W + q - w, 0)
        pads.append((ph, pw))
        accs.append(jnp.zeros((h + ph, w + pw, c), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom
            pl.BlockSpec(
                (1, out_sz, out_sz * c),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # g rows
            pl.BlockSpec(memory_space=pl.ANY),  # accumulators (HBM)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((SMALL_W, SMALL_W + q, c), jnp.float32),
            pltpu.VMEM((MED_W, MED_W + q, c), jnp.float32),
            pltpu.VMEM((LARGE_W, LARGE_W + q, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(
        _bwd_kernel, p=p, c=c, out_size=out_sz, s=sampling_ratio, q=q
    )

    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in accs
        ],
        grid_spec=grid_spec,
        input_output_aliases={8 + li: li for li in range(4)},
        interpret=interpret,
    )(
        cls, lvl, wy, wx, heights, widths, geom,
        g.reshape(n, out_sz, out_sz * c).astype(jnp.float32),
        *accs,
    )
    return {
        nm: outs[li][: level_shapes[li][0], : level_shapes[li][1], :]
        for li, nm in enumerate(levels)
    }
