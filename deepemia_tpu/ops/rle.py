"""Run-length encoding of binary masks.

Parity surface: reference ``src/utils/mask_utils.py:17-35`` — Kaggle-style
column-major (Fortran order), 1-indexed (start, length) pairs. The reference
builds the list with a Python loop over foreground pixels; here encoding is a
vectorized diff over run boundaries (O(H·W) numpy, no Python loop), and a JAX
variant produces fixed-size padded run tensors for fully on-device export.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def rle_encode(mask: np.ndarray) -> List[int]:
    """Encode a binary mask into [start1, len1, start2, len2, ...].

    Column-major scan, starts are 1-indexed (matches reference
    mask_utils.py:17-35 output exactly).
    """
    flat = np.asarray(mask).T.ravel().astype(bool)
    if not flat.any():
        return []
    padded = np.concatenate([[False], flat, [False]])
    diff = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(diff == 1)  # 0-indexed run starts
    ends = np.flatnonzero(diff == -1)
    out = np.empty(2 * starts.size, dtype=np.int64)
    out[0::2] = starts + 1  # 1-indexed
    out[1::2] = ends - starts
    return out.tolist()


def rle_decode(rle: Sequence[int], shape) -> np.ndarray:
    """Inverse of :func:`rle_encode` — returns a bool mask of ``shape``."""
    h, w = shape
    flat = np.zeros(h * w, dtype=bool)
    rle = list(rle)
    for start, length in zip(rle[0::2], rle[1::2]):
        flat[start - 1 : start - 1 + length] = True
    return flat.reshape(w, h).T


def rle_to_string(rle: Sequence[int]) -> str:
    """Space-separated string form used in the results CSV."""
    return " ".join(str(int(v)) for v in rle)


def _nth_marker_positions(jnp, is_start, is_end, k):
    """Positions of the first ``k`` True entries per row of ``is_start`` /
    ``is_end`` ([N, M] bool), in ascending order, plus the per-row start
    count (clamped to k).

    The running count c[i] = #True in [0..i] is monotone and increments
    exactly at marker positions, so the j-th marker (1-indexed) sits at
    the first i with c[i] == j — one ``searchsorted`` per row over the
    cumsum. Rows with fewer than k markers pad with M (masked out by the
    caller's validity row mask).
    """
    import jax

    m = is_start.shape[-1]
    targets = jnp.arange(1, k + 1, dtype=jnp.int32)

    def row(s, e):
        cs = jnp.cumsum(s.astype(jnp.int32))
        ce = jnp.cumsum(e.astype(jnp.int32))
        st = jnp.searchsorted(cs, targets, side="left").astype(jnp.int32)
        en = jnp.searchsorted(ce, targets, side="left").astype(jnp.int32)
        return st, en, jnp.minimum(cs[-1], k).astype(jnp.int32)

    return jax.vmap(row)(is_start, is_end)


def rle_encode_batch_jax(masks, max_runs: int = 2048):
    """On-device RLE for a batch of masks: returns padded (starts, lengths,
    n_runs) arrays. starts are 1-indexed column-major; rows beyond ``n_runs``
    are zero.

    Shapes: masks [N, H, W] (bool) -> starts/lengths [N, max_runs] int32,
    n_runs [N] int32. Used to stream results off device without a host loop
    over pixels; the host only formats integers into the CSV.
    """
    import jax.numpy as jnp

    n, h, w = masks.shape
    flat = jnp.transpose(masks, (0, 2, 1)).reshape(n, h * w).astype(jnp.int8)
    padded = jnp.pad(flat, ((0, 0), (1, 1)))
    diff = padded[:, 1:] - padded[:, :-1]
    is_start = diff[:, : h * w] == 1  # run starts at this flat index
    is_end = diff[:, 1:] == -1  # run ends after this flat index

    k = min(max_runs, h * w)
    # position of the j-th start = first index where the running start
    # count reaches j: a cumsum + batched binary search. O(HW + k·log HW),
    # vs the previous full jnp.sort of an HW-element key vector — at 4k²
    # that sort dominated the whole export program (and ×capacity
    # instances tripped the device runtime's execution watchdog).
    starts_sorted, ends_sorted, n_runs = _nth_marker_positions(
        jnp, is_start, is_end, k
    )
    valid = jnp.arange(k, dtype=jnp.int32)[None, :] < n_runs[:, None]
    starts = jnp.where(valid, starts_sorted + 1, 0).astype(jnp.int32)
    lengths = jnp.where(valid, ends_sorted - starts_sorted + 1, 0).astype(jnp.int32)
    if k < max_runs:
        pad = ((0, 0), (0, max_runs - k))
        starts = jnp.pad(starts, pad)
        lengths = jnp.pad(lengths, pad)
    return starts, lengths, n_runs


def rle_encode_windowed_jax(
    probs,
    boxes,
    valid,
    image_hw,
    max_runs: int = 2048,
    threshold: float = 0.5,
    window: int = 512,
):
    """On-device RLE from per-instance windows: O(K·S²) instead of
    O(K·H·W).

    The full-image encoder pastes every instance to [H, W] and sorts an
    H·W-element key vector per instance; at 4k² that is a ~16.7M-element
    sort ×capacity inside ONE program — minutes of device time, which the
    device runtime's execution watchdog kills (observed: 'TPU worker
    process crashed or restarted' on the tunneled v5e). Here each
    instance's RoI probs paste into a static S×S window at the box corner
    and runs are emitted directly in global column-major coordinates
    (global flat start = (x0 + wc)·H + (y0 + wr) + 1, 1-indexed —
    the convention of :func:`rle_encode` / reference mask_utils.py:17-35).

    Cross-column run merging (a run spanning the bottom of image column c
    into the top of column c+1) cannot occur for a mask confined to a
    window strictly shorter than the image column, so per-column run
    detection inside the window is exact.

    Instances whose box does not fit the window (side > S-4) return
    ``n_runs = max_runs`` — the callers' existing run-capacity branch then
    re-encodes those exactly on the host (pipeline run-capacity fallback).

    probs [K, P, P] float, boxes [K, 4], valid [K] bool ->
    (starts [K, max_runs] i32, lengths [K, max_runs] i32, n_runs [K] i32).
    """
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.ops.masks import paste_masks

    h, w = int(image_hw[0]), int(image_hw[1])
    s = int(min(window, h, w))
    k_cap = min(max_runs, s * s // 2 + 1)

    def one(args):
        p_, b_, v_ = args
        # window corner: 2-px margin for paste rasterization bleed,
        # clamped so the window stays inside the image
        x0 = jnp.clip(jnp.floor(b_[0]).astype(jnp.int32) - 2, 0, w - s)
        y0 = jnp.clip(jnp.floor(b_[1]).astype(jnp.int32) - 2, 0, h - s)
        off = jnp.asarray([x0, y0, x0, y0], jnp.float32)
        fits = ((b_[2] - b_[0]) <= s - 4.0) & ((b_[3] - b_[1]) <= s - 4.0)
        mw = (
            paste_masks((p_[None]), (b_ - off)[None], s, s, threshold)[0]
            & v_
            & fits
        )
        cols = mw.T.astype(jnp.int8)  # [S(w), S(h)] window columns as rows
        padded = jnp.pad(cols, ((0, 0), (1, 1)))
        d = padded[:, 1:] - padded[:, :-1]
        is_start = d[:, :s] == 1  # [S, S] per-column run starts
        is_end = d[:, 1:] == -1
        # window-flat marker positions (row-major over [S(w), S(h)] =
        # window column-major) via cumsum + binary search, then map to
        # global flat coordinates: widx = wc*S + wr -> (x0+wc)*h + y0+wr
        ws, we, nr = _nth_marker_positions(
            jnp, is_start.reshape(1, -1), is_end.reshape(1, -1), k_cap
        )
        ws, we, nr = ws[0], we[0], nr[0]
        rowmask = jnp.arange(k_cap, dtype=jnp.int32) < nr
        g_start = (x0 + ws // s) * h + (y0 + ws % s)
        g_end = (x0 + we // s) * h + (y0 + we % s)
        st = jnp.where(rowmask, g_start + 1, 0).astype(jnp.int32)
        ln = jnp.where(rowmask, g_end - g_start + 1, 0).astype(jnp.int32)
        # oversized instance: signal the caller's exact-host fallback
        nr = jnp.where(v_ & ~fits, jnp.int32(max_runs), nr)
        return st, ln, nr

    starts, lengths, n_runs = jax.lax.map(one, (probs, boxes, valid))
    if k_cap < max_runs:
        pad = ((0, 0), (0, max_runs - k_cap))
        starts = jnp.pad(starts, pad)
        lengths = jnp.pad(lengths, pad)
    return starts, lengths, n_runs
