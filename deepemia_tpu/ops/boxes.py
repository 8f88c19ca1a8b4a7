"""Box geometry + padded NMS as pure XLA ops.

Replaces the reference's CUDA NMS (Detectron2/torchvision, used implicitly in
every predictor call) and its O(n²) Python IoU loops
(``inference.py:2552-2677``, ``spatial_constraints.py:86-155``) with
statically-shaped vectorized programs: an IoU matrix + a greedy suppression
scan under ``lax.fori_loop``. All functions take/return padded arrays with
validity masks — nothing here has data-dependent shapes, so everything fuses
under ``jit``.

Box convention: XYXY_ABS float32 ``[x0, y0, x1, y1]`` (same as the reference's
Detectron2 boxes, datasets.py:230-235).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [...]. Areas of XYXY boxes (clamped at 0)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def pairwise_intersection(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,4],[M,4] -> [N,M] intersection areas."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def box_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,4],[M,4] -> [N,M] IoU (reference spatial_constraints.py:118-153,
    vectorized)."""
    inter = pairwise_intersection(a, b)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def box_containment_matrix(child: jnp.ndarray, parent: jnp.ndarray) -> jnp.ndarray:
    """[N,4],[M,4] -> [N,M]: fraction of each child box inside each parent
    (reference calculate_containment, spatial_constraints.py:156-189)."""
    inter = pairwise_intersection(child, parent)
    child_area = box_area(child)[:, None]
    return jnp.where(child_area > 0, inter / child_area, 0.0)


def boxes_overlap_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,4],[M,4] -> [N,M] bool: any positive intersection (the bbox
    pre-filter of reference inference.py:2680-2698, fixing its tuple-order bug
    Q3 by construction — there is only one box layout here)."""
    return pairwise_intersection(a, b) > 0


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    iou: jnp.ndarray | None = None,
    block_size: int = 512,
) -> jnp.ndarray:
    """Greedy NMS on padded inputs.

    boxes [N,4], scores [N] -> keep mask [N] bool. Invalid rows (``valid``
    False) are never kept and never suppress. Semantics match torchvision NMS
    (strict ``>`` threshold, score-descending greedy order) — the kernel the
    reference relies on inside Detectron2. ``iou_threshold`` may be a scalar
    or a per-instance [N] vector (the keeper's threshold applies). Pass a
    precomputed ``iou`` (e.g. a *mask* IoU matrix) to reuse the greedy logic
    for mask-level dedup.

    Implementation: exact greedy NMS without an O(N) sequential scan.
    Rows are reordered by score rank and processed in ``block_size`` chunks
    under lax.scan; within each chunk the greedy recurrence
        kept[i] = free[i] and no higher-ranked kept j has iou[j,i] > thr[j]
    is iterated to its fixpoint (exact: suppression chains inside a chunk
    are at most ``block_size`` deep and external suppression is already
    settled), and each chunk's keepers mark the suppression they impose on
    all later rows. Worst case O(N/B) scan steps of O(B·N) vector work;
    typical inputs converge in a few inner sweeps per chunk. Measured on
    TPU v5e the scan-step count dominates, not the matrix work, so the
    default block is large (512); worst-case adversarial chains grow with
    the block, so callers with pathological overlap structure can lower it.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    thr = jnp.broadcast_to(jnp.asarray(iou_threshold, jnp.float32), (n,))

    # Reorder everything into descending score-rank space (stable tiebreak by
    # index = the sequential processing order), process rank blocks in
    # sequence, run the fixpoint to exactness WITHIN each block (suppression
    # chains inside a block are at most `block` deep), and carry forward the
    # suppression each block's keepers impose on all later rows. Exact for
    # any input; cost is O(N/B) scan steps of O(B·N) work.
    block = max(8, min(block_size, n))
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    if iou is None:
        # compute the IoU matrix directly in rank space: reordering [N,4]
        # boxes is free, reordering a precomputed [N,N] matrix is two big
        # gathers
        boxes_r = boxes[order]
        iou_r = box_iou_matrix(boxes_r, boxes_r)
    else:
        iou_r = iou[order][:, order]
    valid_r = valid[order]
    thr_r = thr[order]

    pad = (-n) % block
    if pad:
        iou_r = jnp.pad(iou_r, ((0, pad), (0, pad)))
        valid_r = jnp.pad(valid_r, (0, pad))
        thr_r = jnp.pad(thr_r, (0, pad))
    m = n + pad
    n_blocks = m // block

    tri_block = jnp.triu(jnp.ones((block, block), bool), k=1)
    col = jnp.arange(m)

    def scan_body(carry, b):
        ext_suppressed = carry  # [m] suppression accumulated from keepers
        start = b * block
        # suppression rows for this block, computed from the IoU slice in
        # place (materializing the full [m,m] suppression matrix up front
        # costs an extra matrix round trip to HBM)
        iou_rows = jax.lax.dynamic_slice(iou_r, (start, 0), (block, m))
        v_b = jax.lax.dynamic_slice(valid_r, (start,), (block,))
        t_b = jax.lax.dynamic_slice(thr_r, (start,), (block,))
        row_idx = start + jnp.arange(block)
        rows = (
            (iou_rows > t_b[:, None])
            & v_b[:, None]
            & valid_r[None, :]
            & (col[None, :] > row_idx[:, None])
        )
        sup_bb = jax.lax.dynamic_slice(
            rows, (0, start), (block, block)
        ) & tri_block
        ext_b = jax.lax.dynamic_slice(ext_suppressed, (start,), (block,))
        free = v_b & ~ext_b

        def fix_cond(st):
            kept, prev, it = st
            return (it < block) & jnp.any(kept != prev)

        def fix_body(st):
            kept, _, it = st
            s = jnp.any(sup_bb & kept[:, None], axis=0)
            return free & ~s, kept, it + 1

        kept_b, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (free, jnp.zeros_like(free), jnp.int32(0))
        )
        # keepers of this block suppress later rows
        new_sup = jnp.any(rows & kept_b[:, None], axis=0)
        return ext_suppressed | new_sup, kept_b

    _, kept_blocks = jax.lax.scan(
        scan_body, jnp.zeros((m,), bool), jnp.arange(n_blocks)
    )
    kept_r = kept_blocks.reshape(m)[:n]
    return jnp.zeros((n,), bool).at[order].set(kept_r)


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Class-aware NMS: boxes of different classes never suppress each other.

    Uses the coordinate-offset trick (one NMS pass over boxes translated by
    ``class_id * max_extent``) so a single IoU matrix serves all classes.
    """
    extent = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = classes.astype(boxes.dtype)[:, None] * extent * 2.0
    shifted = boxes + jnp.tile(offsets, (1, 4))
    return nms_mask(shifted, scores, iou_threshold, valid=valid)


def top_k_by_score(
    scores: jnp.ndarray, k: int, valid: jnp.ndarray | None = None
):
    """Padded top-k: returns (indices [k], new_valid [k]). Invalid entries
    rank last. The standard dynamic->static shim for proposal selection."""
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(scores, k)
    return idx, jnp.isfinite(vals)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clamp XYXY boxes to image bounds."""
    x0 = jnp.clip(boxes[..., 0], 0, width)
    y0 = jnp.clip(boxes[..., 1], 0, height)
    x1 = jnp.clip(boxes[..., 2], 0, width)
    y1 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def apply_deltas(
    boxes: jnp.ndarray,
    deltas: jnp.ndarray,
    weights=(10.0, 10.0, 5.0, 5.0),
    scale_clamp: float = 4.135166556742356,  # log(1000/16), Detectron2 default
) -> jnp.ndarray:
    """Decode (dx,dy,dw,dh) regression deltas onto anchor/proposal boxes.

    Matches Detectron2's Box2BoxTransform (weights (10,10,5,5) for RoI heads,
    (1,1,1,1) for RPN) — the box-decoding convention the weight converter
    depends on (SURVEY.md §7 'Hard parts').
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, scale_clamp)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )


def get_deltas(
    src: jnp.ndarray, target: jnp.ndarray, weights=(10.0, 10.0, 5.0, 5.0)
) -> jnp.ndarray:
    """Encode target boxes relative to source boxes (training targets)."""
    wx, wy, ww, wh = weights
    src_w = src[..., 2] - src[..., 0]
    src_h = src[..., 3] - src[..., 1]
    src_cx = src[..., 0] + 0.5 * src_w
    src_cy = src[..., 1] + 0.5 * src_h
    t_w = target[..., 2] - target[..., 0]
    t_h = target[..., 3] - target[..., 1]
    t_cx = target[..., 0] + 0.5 * t_w
    t_cy = target[..., 1] + 0.5 * t_h
    eps = 1e-6
    return jnp.stack(
        [
            wx * (t_cx - src_cx) / jnp.maximum(src_w, eps),
            wy * (t_cy - src_cy) / jnp.maximum(src_h, eps),
            ww * jnp.log(jnp.maximum(t_w, eps) / jnp.maximum(src_w, eps)),
            wh * jnp.log(jnp.maximum(t_h, eps) / jnp.maximum(src_h, eps)),
        ],
        axis=-1,
    )
