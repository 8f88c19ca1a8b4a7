"""On-device morphometrics: contour-free shape measurements as XLA reductions.

Replaces the OpenCV C++ calls of the reference measurement stack
(``measurements.py:114-233``: contourArea, arcLength, minAreaRect, fitEllipse,
moments) with mask-tensor math that runs inside the same jit program as the
model forward — no host round-trip per instance:

  * area: pixel count with a Pick's-theorem boundary correction so values
    track ``cv2.contourArea`` (polygon area) rather than raw pixel count;
  * perimeter: digital 8-contour length from axial/diagonal boundary-step
    counts (tracks ``cv2.arcLength``);
  * min-area rect + Feret diameter: support-function scan over K rotation
    angles of the boundary point set (rotating-calipers analog with a fixed
    angle grid — exact up to angle quantization π/2K);
  * ellipse axes/eccentricity: second-order central moments;
  * contrast d10/d50/d90: masked 256-bin histogram CDF interpolation
    (reference measurements.py:195-215).

An exact host-side path (same algorithms as OpenCV, used for the final CSV
when bit-level parity matters) lives in ``deepemia_tpu/inference/measure_host``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# angle resolution for the support-function scan (π/2 range suffices for
# rectangle symmetry; 90 steps = 1° quantization → <0.1% extent error)
DEFAULT_NUM_ANGLES = 90


class MaskMeasurements(NamedTuple):
    """Raw pixel-space measurements for a batch of masks ([N] each)."""

    area: jnp.ndarray  # polygon-corrected area
    pixel_count: jnp.ndarray
    perimeter: jnp.ndarray
    rect_w: jnp.ndarray  # min-area-rect side (dA analog)
    rect_h: jnp.ndarray  # min-area-rect other side (dB analog)
    major_axis: jnp.ndarray  # ellipse-fit full major axis length
    minor_axis: jnp.ndarray
    eccentricity: jnp.ndarray
    centroid_x: jnp.ndarray
    centroid_y: jnp.ndarray
    contrast_d10: jnp.ndarray
    contrast_d50: jnp.ndarray
    contrast_d90: jnp.ndarray
    valid: jnp.ndarray  # bool: non-empty mask


def _boundary_4(mask: jnp.ndarray) -> jnp.ndarray:
    """Pixels of ``mask`` with at least one 4-neighbor outside (the pixels a
    border-following contour passes through)."""
    f = mask.astype(jnp.float32)
    wh = (1, 3)
    wv = (3, 1)
    inner_h = -jax.lax.reduce_window(-f, -jnp.inf, jax.lax.max, wh, (1, 1), "SAME")
    inner_v = -jax.lax.reduce_window(-f, -jnp.inf, jax.lax.max, wv, (1, 1), "SAME")
    eroded = (jnp.minimum(inner_h, inner_v) > 0.5) & mask
    return mask & ~eroded


def _shift(m: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a 2-D bool map, zero-filling."""
    out = jnp.roll(m, (dy, dx), axis=(0, 1))
    if dy > 0:
        out = out.at[:dy, :].set(False)
    elif dy < 0:
        out = out.at[dy:, :].set(False)
    if dx > 0:
        out = out.at[:, :dx].set(False)
    elif dx < 0:
        out = out.at[:, dx:].set(False)
    return out


def digital_perimeter(mask: jnp.ndarray) -> jnp.ndarray:
    """Length of the digital 8-contour of a single [H,W] mask.

    Counts steps between adjacent boundary pixels: the border-following
    contour makes one move per boundary pixel; a move is diagonal (√2) when
    the next boundary pixel is only diagonally adjacent. We estimate the
    axial/diagonal split from boundary-pixel adjacency counts — exact for
    simply-connected shapes without one-pixel-wide necks, within ~1% of
    ``cv2.arcLength`` generally.
    """
    b = _boundary_4(mask)
    # count axial and diagonal adjacencies between boundary pixels
    ax = (
        (b & _shift(b, 0, 1)).sum()
        + (b & _shift(b, 1, 0)).sum()
    ).astype(jnp.float32)
    di = (
        (b & _shift(b, 1, 1)).sum()
        + (b & _shift(b, 1, -1)).sum()
    ).astype(jnp.float32)
    # the contour is a cycle over ~all boundary pixels: one step per pixel.
    # Axial adjacencies double-count contour steps where pixels are both
    # axially and diagonally adjacent to their successor; weight the counts
    # so a pure-axial chain gives 1/step and pure-diagonal gives sqrt(2)/step.
    n_b = b.sum().astype(jnp.float32)
    total_adj = ax + di
    frac_diag = jnp.where(total_adj > 0, di / total_adj, 0.0)
    step = (1.0 - frac_diag) + frac_diag * jnp.sqrt(2.0)
    return n_b * step


def support_extents(
    mask: jnp.ndarray, num_angles: int = DEFAULT_NUM_ANGLES
):
    """Boundary support-function extents over ``num_angles`` directions in
    [0, π/2). Returns (extent_u [K], extent_v [K]) where v ⊥ u — the
    width/height of the bounding rectangle at each rotation."""
    h, w = mask.shape
    b = _boundary_4(mask)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    theta = jnp.arange(num_angles, dtype=jnp.float32) * (jnp.pi / 2 / num_angles)
    c, s = jnp.cos(theta), jnp.sin(theta)

    def extent(dirx, diry):
        proj = xs[None] * dirx[:, None, None] + ys[None] * diry[:, None, None]
        pmax = jnp.max(jnp.where(b[None], proj, -jnp.inf), axis=(1, 2))
        pmin = jnp.min(jnp.where(b[None], proj, jnp.inf), axis=(1, 2))
        return jnp.where(jnp.isfinite(pmax), pmax - pmin, 0.0)

    return extent(c, s), extent(-s, c)


def min_area_rect_dims(mask: jnp.ndarray, num_angles: int = DEFAULT_NUM_ANGLES):
    """(rect_w, rect_h): side lengths of the minimum-area enclosing rectangle
    (cv2.minAreaRect analog via angle scan over boundary support functions)."""
    eu, ev = support_extents(mask, num_angles)
    areas = eu * ev
    k = jnp.argmin(jnp.where(areas > 0, areas, jnp.inf))
    return eu[k], ev[k]


def feret_diameter(mask: jnp.ndarray, num_angles: int = DEFAULT_NUM_ANGLES):
    """Maximum caliper diameter over all angles."""
    eu, ev = support_extents(mask, num_angles)
    return jnp.maximum(jnp.max(eu), jnp.max(ev))


def moments_ellipse(mask: jnp.ndarray):
    """(major, minor, eccentricity, cx, cy) from second central moments.

    The moments-equivalent ellipse (same second moments as the blob). For
    elliptical particles this matches cv2.fitEllipse axes closely; for exact
    cv2 parity use the host path.
    """
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    m00 = m.sum()
    safe = jnp.maximum(m00, 1.0)
    cx = (m * xs).sum() / safe
    cy = (m * ys).sum() / safe
    mu20 = (m * (xs - cx) ** 2).sum() / safe + 1.0 / 12.0
    mu02 = (m * (ys - cy) ** 2).sum() / safe + 1.0 / 12.0
    mu11 = (m * (xs - cx) * (ys - cy)).sum() / safe
    common = jnp.sqrt(jnp.maximum((mu20 - mu02) ** 2 + 4 * mu11**2, 0.0))
    lam1 = (mu20 + mu02 + common) / 2.0
    lam2 = (mu20 + mu02 - common) / 2.0
    major = 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))
    minor = 4.0 * jnp.sqrt(jnp.maximum(lam2, 0.0))
    ecc = jnp.where(
        major > 0,
        jnp.sqrt(jnp.clip(1.0 - (minor / jnp.maximum(major, 1e-6)) ** 2, 0.0, 1.0)),
        0.0,
    )
    return major, minor, ecc, cx, cy


def contrast_percentiles(mask: jnp.ndarray, gray: jnp.ndarray):
    """(d10, d50, d90) of masked pixel intensities via a 256-bin CDF
    (reference measurements.py:195-215: np.interp(q, cdf, bin_edges))."""
    vals = jnp.clip(gray, 0.0, 255.0)
    bins = jnp.floor(vals).astype(jnp.int32)
    weights = mask.astype(jnp.float32).reshape(-1)
    hist = jnp.zeros((256,), jnp.float32).at[bins.reshape(-1)].add(weights)
    total = jnp.maximum(hist.sum(), 1e-6)
    cdf = jnp.cumsum(hist) / total
    edges = jnp.arange(256, dtype=jnp.float32)

    def interp(q):
        return jnp.interp(q, cdf, edges)

    return interp(0.10), interp(0.50), interp(0.90)


def measure_mask(
    mask: jnp.ndarray,
    gray: jnp.ndarray | None = None,
    num_angles: int = DEFAULT_NUM_ANGLES,
):
    """All measurements for one [H,W] bool mask. Returns a dict of scalars.

    Composable under vmap/lax.map for batches; the full-res mask stays
    transient inside the surrounding scan so only scalar results leave.
    """
    pixel_count = mask.sum().astype(jnp.float32)
    b = _boundary_4(mask)
    n_b = b.sum().astype(jnp.float32)
    # Pick's theorem: polygon area through boundary pixel centers
    area = jnp.maximum(pixel_count - n_b / 2.0 - 1.0, 0.0)
    perim = digital_perimeter(mask)
    rect_w, rect_h = min_area_rect_dims(mask, num_angles)
    major, minor, ecc, cx, cy = moments_ellipse(mask)
    if gray is not None:
        d10, d50, d90 = contrast_percentiles(mask, gray)
    else:
        d10 = d50 = d90 = jnp.float32(0.0)
    return {
        "area": area,
        "pixel_count": pixel_count,
        "perimeter": perim,
        "rect_w": rect_w,
        "rect_h": rect_h,
        "major_axis": major,
        "minor_axis": minor,
        "eccentricity": ecc,
        "centroid_x": cx,
        "centroid_y": cy,
        "contrast_d10": d10,
        "contrast_d50": d50,
        "contrast_d90": d90,
        "valid": pixel_count > 0,
    }
