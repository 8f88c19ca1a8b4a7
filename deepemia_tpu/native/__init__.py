"""ctypes bindings for the native measurement kernels (native/measure.cpp).

Loads ``libdeepemia_native.so``; if absent, compiles it with g++ on first
use; if no toolchain is available, pure-numpy fallbacks (same algorithms)
keep the API working. cv2-parity of the native path is covered by tests.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("deepemia_tpu.native")

_SRC_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_NAME = "libdeepemia_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build_library() -> Optional[Path]:
    src = _SRC_DIR / "measure.cpp"
    out = _SRC_DIR / _LIB_NAME
    if not src.exists():
        return None
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(src), "-o", str(out)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except (OSError, subprocess.SubprocessError) as e:
        log.warning("Native library build failed (%s); using numpy fallback", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    path = _SRC_DIR / _LIB_NAME
    if not path.exists():
        path = _build_library()
    if path and Path(path).exists():
        try:
            lib = ctypes.CDLL(str(path))
            lib.trace_outer_contour.restype = ctypes.c_int
            lib.fit_ellipse.restype = ctypes.c_int
            _lib = lib
        except OSError as e:
            log.warning("Native library load failed: %s", e)
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


# ---------------------------------------------------------------------------
# Public API (native with numpy fallback)
# ---------------------------------------------------------------------------


def trace_outer_contour(mask: np.ndarray, max_pts: int = 16384) -> np.ndarray:
    """[H,W] bool/uint8 -> [N,2] float64 (x, y) outer-border points of the
    first component in raster order (cv2 RETR_EXTERNAL analog)."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    lib = get_lib()
    if lib is not None:
        buf = np.zeros((max_pts, 2), np.int32)
        n = lib.trace_outer_contour(
            _ptr(m), m.shape[0], m.shape[1], _ptr(buf), max_pts
        )
        return buf[:n].astype(np.float64)
    return _trace_fallback(m, max_pts)


def polygon_area_perimeter(pts: np.ndarray) -> Tuple[float, float]:
    """Closed-polygon (shoelace area, perimeter) — cv2 contourArea/arcLength."""
    pts = np.ascontiguousarray(pts, np.float64)
    n = len(pts)
    if n < 2:
        return 0.0, 0.0
    lib = get_lib()
    if lib is not None:
        out = np.zeros(2)
        lib.polygon_area_perimeter(_ptr(pts), n, _ptr(out))
        return float(out[0]), float(out[1])
    x, y = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    area = abs(np.sum(x * y1 - x1 * y)) / 2.0
    per = float(np.sum(np.hypot(x1 - x, y1 - y)))
    return float(area), per


def min_area_rect(pts: np.ndarray) -> Tuple[float, float]:
    """Minimum-area enclosing rectangle side lengths (cv2.minAreaRect dims)."""
    pts = np.ascontiguousarray(pts, np.float64)
    n = len(pts)
    if n == 0:
        return 0.0, 0.0
    lib = get_lib()
    if lib is not None:
        out = np.zeros(2)
        lib.min_area_rect(_ptr(pts), n, _ptr(out))
        return float(out[0]), float(out[1])
    return _min_area_rect_fallback(pts)


def fit_ellipse(pts: np.ndarray) -> Optional[Tuple[float, float, float]]:
    """(major_axis, minor_axis, eccentricity) via direct LSQ ellipse fit
    (cv2.fitEllipse analog); None for degenerate input (< 5 points)."""
    pts = np.ascontiguousarray(pts, np.float64)
    if len(pts) < 5:
        return None
    lib = get_lib()
    if lib is not None:
        out = np.zeros(6)
        rc = lib.fit_ellipse(_ptr(pts), len(pts), _ptr(out))
        if rc == 0:
            return float(out[0]), float(out[1]), float(out[2])
        return None
    return _fit_ellipse_fallback(pts)


# ---------------------------------------------------------------------------
# numpy fallbacks
# ---------------------------------------------------------------------------


def _trace_fallback(mask: np.ndarray, max_pts: int) -> np.ndarray:
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        return np.zeros((0, 2))
    sy, sx = int(ys[0]), int(xs[ys == ys[0]].min())
    dy = [0, -1, -1, -1, 0, 1, 1, 1]
    dx = [-1, -1, 0, 1, 1, 1, 0, -1]

    def at(y, x):
        return 0 <= y < h and 0 <= x < w and mask[y, x]

    pts = []
    cy, cx, back = sy, sx, 0
    for _ in range(4 * h * w):
        pts.append((cx, cy))
        found = -1
        for k in range(8):
            d = (back + 1 + k) % 8
            if at(cy + dy[d], cx + dx[d]):
                found = d
                break
        if found < 0:
            break
        cy += dy[found]
        cx += dx[found]
        back = (found + 4) % 8
        if (cy, cx) == (sy, sx) and len(pts) >= 2:
            break
        if len(pts) >= max_pts:
            break
    return np.array(pts, np.float64)


def _min_area_rect_fallback(pts: np.ndarray) -> Tuple[float, float]:
    uniq = np.unique(pts, axis=0)
    if len(uniq) == 1:
        return 0.0, 0.0
    if len(uniq) == 2:
        return float(np.hypot(*(uniq[1] - uniq[0]))), 0.0
    # convex hull via monotone chain
    pts_s = uniq[np.lexsort((uniq[:, 1], uniq[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out[:-1]

    hull = np.array(half(list(pts_s)) + half(list(pts_s[::-1])))
    if len(hull) < 3:
        d = np.max(
            np.hypot(
                uniq[:, None, 0] - uniq[None, :, 0],
                uniq[:, None, 1] - uniq[None, :, 1],
            )
        )
        return float(d), 0.0
    best = (np.inf, 0.0, 0.0)
    for i in range(len(hull)):
        e = hull[(i + 1) % len(hull)] - hull[i]
        ln = np.hypot(*e)
        if ln < 1e-12:
            continue
        u = e / ln
        v = np.array([-u[1], u[0]])
        pu = hull @ u
        pv = hull @ v
        cw, ch = pu.max() - pu.min(), pv.max() - pv.min()
        if cw * ch < best[0]:
            best = (cw * ch, cw, ch)
    return float(best[1]), float(best[2])


def _fit_ellipse_fallback(pts: np.ndarray):
    x = pts[:, 0] - pts[:, 0].mean()
    y = pts[:, 1] - pts[:, 1].mean()
    D1 = np.stack([x * x, x * y, y * y], axis=1)
    D2 = np.stack([x, y, np.ones_like(x)], axis=1)
    S1 = D1.T @ D1
    S2 = D1.T @ D2
    S3 = D2.T @ D2
    try:
        T = -np.linalg.solve(S3, S2.T)
    except np.linalg.LinAlgError:
        return None
    M = S1 + S2 @ T
    M = np.array([M[2] / 2.0, -M[1], M[0] / 2.0])
    vals, vecs = np.linalg.eig(M)
    cond = 4 * vecs[0] * vecs[2] - vecs[1] ** 2
    ok = np.where(np.isreal(vals) & (cond > 0))[0]
    if ok.size == 0:
        return None
    a1 = np.real(vecs[:, ok[0]])
    a, b, c = a1
    d, e, f = T @ a1
    den = 4 * a * c - b * b
    cx = (b * e - 2 * c * d) / den
    cy = (b * d - 2 * a * e) / den
    fc = a * cx * cx + b * cx * cy + c * cy * cy + d * cx + e * cy + f
    tr2 = a + c
    det2 = a * c - b * b / 4.0
    disc = np.sqrt(max(tr2 * tr2 / 4.0 - det2, 0.0))
    l1, l2 = tr2 / 2.0 + disc, tr2 / 2.0 - disc
    if l1 <= 0 or l2 <= 0:
        l1, l2, fc = -l1, -l2, -fc
    if l1 <= 0 or l2 <= 0 or fc >= 0:
        return None
    s1 = np.sqrt(-fc / l1)
    s2 = np.sqrt(-fc / l2)
    major, minor = 2 * max(s1, s2), 2 * min(s1, s2)
    ecc = float(np.sqrt(1.0 - (minor / major) ** 2)) if major > 0 else 0.0
    return float(major), float(minor), ecc
