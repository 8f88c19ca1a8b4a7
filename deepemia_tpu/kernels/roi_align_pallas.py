"""Pallas TPU RoIAlign: per-RoI window DMA + MXU interpolation matmul.

The production RoIAlign hot path (replaces the XLA point-gather of
models/roi_align.py when enabled). Design:

  * FPN features are kept per level as 2-D ``[H, W·C]`` HBM buffers so a
    RoI's spatial window is ONE rectangular async copy into VMEM;
  * each grid step processes one RoI: scalar-prefetched ints select the
    assigned level and window origin, the window is DMA'd, and bilinear
    sampling is expressed as a small on-the-fly interpolation matrix
    ``[P², W_win²]`` (4 nonzeros per row, built from iota comparisons)
    multiplied with the window ``[W_win², C]`` on the MXU;
  * out-of-window/out-of-image samples get zero weight, matching the
    reference CUDA op's zeroing semantics.

The fixed window cap (``WINDOW`` cells) covers every box the FPN level
assignment can route to a level (boxes land on a level when their scale is
~112-448 px, i.e. 7-28 cells; elongated boxes may exceed the cap on one side
and are handled by the caller falling back to the XLA path for that batch —
in practice detection boxes within a level fit 32 cells).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepemia_tpu.models.anchors import STRIDES

WINDOW = 64  # window x-extent in cells
WINDOW_H = 72  # window y-extent: WINDOW + 8 slack so the origin can be
# aligned down to the sublane tiling (Mosaic requires dim-0 DMA offsets
# divisible by 8). VMEM: 72*64*256*4B = 4.7MB f32 scratch.


def _prepare_rois(boxes, level_shapes, strides, output_size, sampling_ratio):
    """Host/JAX-side per-RoI geometry: level id, window origin, and the
    continuous sample start/step in window-local cell coordinates."""
    from deepemia_tpu.models.roi_align import assign_fpn_levels

    p = output_size * sampling_ratio
    lvl = assign_fpn_levels(boxes) - 2  # [N] 0..3
    # bump elongated boxes to the coarsest level whose stride fits the box
    # inside the window (FPN assignment is by sqrt-area, so a high-aspect box
    # can span more cells than the window on its long side; sampling it one
    # level up trades a little resolution for exact coverage)
    max_px = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    fit_cells = float(WINDOW - 4)
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
    # first/last sample centers
    sx0 = x0 + (0.5 / p) * bw
    sy0 = y0 + (0.5 / p) * bh
    step_x = bw / p
    step_y = bh / p
    # window origin: floor of first sample, clamped so the window fits;
    # the row origin is aligned down to 8 (sublane tiling) with WINDOW_H
    # providing the slack
    wx = jnp.clip(
        jnp.floor(sx0).astype(jnp.int32), 0, jnp.maximum(widths - WINDOW, 0)
    )
    wy = jnp.clip(
        jnp.floor(sy0).astype(jnp.int32), 0, jnp.maximum(heights - WINDOW_H, 0)
    )
    wy = (wy // 8) * 8
    return {
        "level": lvl.astype(jnp.int32),
        "wy": wy,
        "wx": wx,
        "heights": heights,
        "widths": widths,
        "sy0": sy0,
        "sx0": sx0,
        "step_y": step_y,
        "step_x": step_x,
    }


def _kernel(
    # scalar prefetch
    level_ref, wy_ref, wx_ref, h_ref, w_ref,
    # vector inputs
    geom_ref,  # [N, 4] f32: sy0, sx0, step_y, step_x (VMEM)
    f0, f1, f2, f3,  # per-level [H, W*C] HBM refs
    out_ref,  # [P, P*C] VMEM block for this RoI
    window,  # scratch [WINDOW, WINDOW*C]
    sem,
    *, p: int, c: int, out_size: int, s: int,
):
    i = pl.program_id(0)
    lvl = level_ref[i]
    wy = wy_ref[i]
    wx = wx_ref[i]
    lh = h_ref[i]
    lw = w_ref[i]

    # DMA the RoI window from the assigned level (exactly one branch fires;
    # copy completes within the branch — DMA semaphores are waited via the
    # copy descriptor, not semaphore_wait)
    def do_copy(ref):
        cp = pltpu.make_async_copy(
            ref.at[
                pl.ds(pl.multiple_of(wy, 8), WINDOW_H),
                pl.ds(wx * c, WINDOW * c),
            ],
            window,
            sem,
        )
        cp.start()
        cp.wait()

    @pl.when(lvl == 0)
    def _():
        do_copy(f0)

    @pl.when(lvl == 1)
    def _():
        do_copy(f1)

    @pl.when(lvl == 2)
    def _():
        do_copy(f2)

    @pl.when(lvl == 3)
    def _():
        do_copy(f3)

    sy0 = geom_ref[i, 0]
    sx0 = geom_ref[i, 1]
    step_y = geom_ref[i, 2]
    step_x = geom_ref[i, 3]

    # sample coordinates in window-local cells: [P]
    k = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0].astype(jnp.float32)
    sy = sy0 - wy.astype(jnp.float32) + k * step_y
    sx = sx0 - wx.astype(jnp.float32) + k * step_x
    # interpolation weights: rows [P, WINDOW_H], cols [P, WINDOW]
    cells_y = jax.lax.broadcasted_iota(jnp.int32, (p, WINDOW_H), 1).astype(jnp.float32)
    cells = jax.lax.broadcasted_iota(jnp.int32, (p, WINDOW), 1).astype(jnp.float32)
    fy = sy[:, None] - cells_y
    fx = sx[:, None] - cells
    wy_mat = jnp.clip(1.0 - jnp.abs(fy), 0.0, 1.0)  # tent kernel = bilinear
    wx_mat = jnp.clip(1.0 - jnp.abs(fx), 0.0, 1.0)
    # border-replicate clamp (reference op): weight falling off the window's
    # level-boundary edge accumulates onto the edge cell
    win_h = lh - wy  # cells of the window that lie inside the level
    win_w = lw - wx
    lastf_y = jnp.minimum(win_h, WINDOW_H).astype(jnp.float32) - 1.0
    lastf_x = jnp.minimum(win_w, WINDOW).astype(jnp.float32) - 1.0
    last_y = cells_y == lastf_y
    last_x = cells == lastf_x
    first_cell = cells == 0.0
    first_cell_y = cells_y == 0.0
    wy_mat = wy_mat + first_cell_y * jnp.clip(-sy, 0.0, 1.0)[:, None]
    wx_mat = wx_mat + first_cell * jnp.clip(-sx, 0.0, 1.0)[:, None]
    wy_mat = wy_mat + last_y * jnp.clip(sy[:, None] - lastf_y, 0.0, 1.0)
    wx_mat = wx_mat + last_x * jnp.clip(sx[:, None] - lastf_x, 0.0, 1.0)
    # zero cells past the level boundary and fully-outside samples
    in_y = cells_y <= lastf_y
    in_x = cells <= lastf_x
    ly = sy + wy.astype(jnp.float32)
    lx = sx + wx.astype(jnp.float32)
    vy = ((ly >= -1.0) & (ly <= lh.astype(jnp.float32)))[:, None]
    vx = ((lx >= -1.0) & (lx <= lw.astype(jnp.float32)))[:, None]
    wy_mat = wy_mat * vy * in_y
    wx_mat = wx_mat * vx * in_x

    # rows: [P, WINDOW_H] @ window [WINDOW_H, WINDOW*C] -> [P, WINDOW*C]
    win = window[...].astype(jnp.float32)
    rowmix = jax.lax.dot_general(
        wy_mat, win, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(p, WINDOW, c)
    # columns: samples[jx, iy, c] = sum_w wx_mat[jx, w] * rowmix[iy, w, c]
    samples = jax.lax.dot_general(
        wx_mat,
        rowmix,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P_x, P_y, C]
    samples = jnp.transpose(samples, (1, 0, 2))  # [P_y, P_x, C]

    # average-pool s×s -> [out, out, C], write as [1, out, out*C]
    pooled = samples.reshape(out_size, s, out_size, s, c).mean(axis=(1, 3))
    out_ref[...] = pooled.reshape(1, out_size, out_size * c).astype(out_ref.dtype)


def roi_align_pallas(
    features: Dict[str, jnp.ndarray],
    boxes: jnp.ndarray,
    output_size: int = 7,
    sampling_ratio: int = 2,
    levels: Sequence[str] = ("p2", "p3", "p4", "p5"),
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in multilevel RoIAlign via the Pallas kernel.

    features {level: [H,W,C]}, boxes [N,4] -> [N,out,out,C] float32.
    """
    n = boxes.shape[0]
    c = features[levels[0]].shape[-1]
    p = output_size * sampling_ratio
    level_shapes = [features[nm].shape[:2] for nm in levels]
    strides = [STRIDES[nm] for nm in levels]
    geom = _prepare_rois(boxes, level_shapes, strides, output_size, sampling_ratio)

    # per-level [H, W*C] views, padded so any clamped window fits
    flat_levels = []
    for nm in levels:
        f = features[nm]
        h, w, _ = f.shape
        ph = max(WINDOW_H - h, 0)
        pw = max(WINDOW - w, 0)
        if ph or pw:
            f = jnp.pad(f, ((0, ph), (0, pw), (0, 0)))
        flat_levels.append(f.reshape(f.shape[0], f.shape[1] * c))

    geom_vec = jnp.stack(
        [geom["sy0"], geom["sx0"], geom["step_y"], geom["step_x"]], axis=1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # geom
            pl.BlockSpec(memory_space=pltpu.ANY),  # f0 (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, output_size, output_size * c),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((WINDOW_H, WINDOW * c), flat_levels[0].dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(
        _kernel, p=p, c=c, out_size=output_size, s=sampling_ratio
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, output_size, output_size * c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        geom["level"],
        geom["wy"],
        geom["wx"],
        geom["heights"],
        geom["widths"],
        geom_vec,
        *flat_levels,
    )
    return out.reshape(n, output_size, output_size, c)
