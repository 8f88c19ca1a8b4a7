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
    idx = jnp.arange(h * w, dtype=jnp.int32)[None, :]
    big = jnp.int32(h * w + 1)
    start_keys = jnp.where(is_start, idx, big)
    end_keys = jnp.where(is_end, idx, big)
    starts_sorted = jnp.sort(start_keys, axis=1)[:, :k]
    ends_sorted = jnp.sort(end_keys, axis=1)[:, :k]
    n_runs = jnp.minimum(is_start.sum(axis=1), k).astype(jnp.int32)
    valid = jnp.arange(k, dtype=jnp.int32)[None, :] < n_runs[:, None]
    starts = jnp.where(valid, starts_sorted + 1, 0).astype(jnp.int32)
    lengths = jnp.where(valid, ends_sorted - starts_sorted + 1, 0).astype(jnp.int32)
    if k < max_runs:
        pad = ((0, 0), (0, max_runs - k))
        starts = jnp.pad(starts, pad)
        lengths = jnp.pad(lengths, pad)
    return starts, lengths, n_runs
