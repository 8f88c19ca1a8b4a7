"""Tile-grid math + batched tile extraction/stitching.

Re-architecture of the reference's host-side tile loop
(``generate_tiles_with_overlap``, inference.py:2488-2519: stride
``tile_size·(1−overlap)``, zero-padded edge tiles) into a static grid: the
tile layout is a pure function of (H, W, tile_size, overlap) computed at trace
time, tiles are extracted as one ``[T, ts, ts, C]`` gather, and results are
stitched back by adding per-tile offsets to box coordinates — all on device.

The tile axis is the unit of sharding for multi-chip inference (SURVEY.md
§2c: the spatial analog of sequence parallelism).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TileGrid(NamedTuple):
    """Static description of a tile decomposition."""

    offsets: np.ndarray  # [T, 2] int32 (x, y) top-left corners
    tile_size: int
    stride: int
    image_hw: Tuple[int, int]

    @property
    def num_tiles(self) -> int:
        return len(self.offsets)


def compute_tile_grid(
    height: int, width: int, tile_size: int, overlap_ratio: float
) -> TileGrid:
    """Static tile layout matching reference inference.py:2499-2506: offsets
    every ``stride = tile_size·(1−overlap)`` from 0 while < image extent
    (edge tiles extend past the border and are zero-padded)."""
    stride = max(int(tile_size * (1.0 - overlap_ratio)), 1)
    ys = list(range(0, height, stride))
    xs = list(range(0, width, stride))
    offsets = np.array(
        [(x, y) for y in ys for x in xs], dtype=np.int32
    ).reshape(-1, 2)
    return TileGrid(offsets, tile_size, stride, (height, width))


def extract_tiles(image: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """[H,W,C] -> [T, ts, ts, C]; out-of-bounds regions zero-padded.

    Implemented as a single pad + static strided gather (offsets are trace
    constants), so XLA emits one fused copy, not T host slices.
    """
    ts = grid.tile_size
    h, w = grid.image_hw
    pad_h = max(int(grid.offsets[:, 1].max()) + ts - h, 0) if grid.num_tiles else 0
    pad_w = max(int(grid.offsets[:, 0].max()) + ts - w, 0) if grid.num_tiles else 0
    padded = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    tiles = jnp.stack(
        [
            jax.lax.dynamic_slice(
                padded,
                (int(y), int(x), 0),
                (ts, ts, image.shape[-1]),
            )
            for x, y in grid.offsets
        ]
    )
    return tiles


def tile_boxes_to_global(
    boxes: jnp.ndarray, tile_offsets: jnp.ndarray, scale: float = 1.0
) -> jnp.ndarray:
    """Map tile-local XYXY boxes to global coordinates.

    boxes [T,N,4] predicted on (possibly upscaled) tiles; ``scale`` is the
    upscale factor the tile was resized by before the forward pass (reference
    inference.py:2378-2420 downscales masks then offsets). tile_offsets [T,2]
    (x, y).
    """
    b = boxes / scale
    off = tile_offsets.astype(b.dtype)  # [T,2] (x,y)
    shift = jnp.concatenate([off, off], axis=-1)[:, None, :]  # [T,1,4]
    return b + shift


def global_boxes_to_tile(
    boxes: jnp.ndarray, tile_offset, scale: float = 1.0
) -> jnp.ndarray:
    """Inverse of :func:`tile_boxes_to_global` for a single tile."""
    off = jnp.asarray(tile_offset, boxes.dtype)
    shift = jnp.concatenate([off, off], axis=-1)
    return (boxes - shift) * scale
