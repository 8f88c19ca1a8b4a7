"""Tests for mask ops: bboxes, IoU matmul, paste, morphology, components."""

import numpy as np
import pytest
import scipy.ndimage as ndi

jnp = pytest.importorskip("jax.numpy")
import jax

from deepemia_tpu.ops import masks as M

_fill = jax.jit(M.fill_holes)
_ncomp = jax.jit(M.num_components)
_lcomp = jax.jit(M.largest_component)
_ccomp = jax.jit(M.connected_components)


def _blob(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def test_mask_bboxes():
    m = np.zeros((2, 20, 30), bool)
    m[0, 5:10, 7:15] = True  # y 5..9, x 7..14
    got = np.asarray(M.mask_bboxes(jnp.asarray(m)))
    np.testing.assert_allclose(got[0], [7, 5, 15, 10])
    np.testing.assert_allclose(got[1], [0, 0, 0, 0])  # empty


def test_mask_iou_exact(rng):
    a = rng.random((5, 32, 32)) > 0.5
    b = rng.random((3, 32, 32)) > 0.5
    got = np.asarray(M.mask_iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(5):
        for j in range(3):
            inter = (a[i] & b[j]).sum()
            union = (a[i] | b[j]).sum()
            expect = inter / union if union else 0.0
            assert got[i, j] == pytest.approx(expect, abs=1e-6)


def test_mask_iou_stride_close(rng):
    a = np.stack([_blob(64, 64, 30, 30, 20), _blob(64, 64, 34, 34, 18)])
    exact = np.asarray(M.mask_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    approx = np.asarray(M.mask_iou_matrix(jnp.asarray(a), jnp.asarray(a), stride=4))
    np.testing.assert_allclose(approx, exact, atol=0.05)


def test_containment():
    small = _blob(40, 40, 20, 20, 5)[None]
    big = _blob(40, 40, 20, 20, 15)[None]
    c = np.asarray(M.mask_containment_matrix(jnp.asarray(small), jnp.asarray(big)))
    assert c[0, 0] == pytest.approx(1.0)
    c2 = np.asarray(M.mask_containment_matrix(jnp.asarray(big), jnp.asarray(small)))
    assert 0.05 < c2[0, 0] < 0.25


def test_paste_masks_basic():
    probs = jnp.ones((1, 28, 28))
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    out = np.asarray(M.paste_masks(probs, boxes, 64, 64))
    ys, xs = np.nonzero(out[0])
    assert xs.min() >= 10 and xs.max() <= 30
    assert ys.min() >= 20 and ys.max() <= 40
    # interior fully covered
    assert out[0, 25:35, 15:25].all()
    # half-probability under threshold 0.6 -> empty
    out2 = np.asarray(M.paste_masks(probs * 0.5, boxes, 64, 64, threshold=0.6))
    assert not out2.any()


def test_paste_masks_gradient_center():
    """A centered bump survives pasting; location matches the box center."""
    g = np.zeros((28, 28), np.float32)
    g[10:18, 10:18] = 1.0
    out = np.asarray(
        M.paste_masks(jnp.asarray(g[None]), jnp.asarray([[0.0, 0.0, 56.0, 56.0]]), 56, 56)
    )
    ys, xs = np.nonzero(out[0])
    assert abs(ys.mean() - 27.5) < 3 and abs(xs.mean() - 27.5) < 3


def test_morphology_matches_scipy(rng):
    m = rng.random((2, 24, 24)) > 0.6
    got_d = np.asarray(M.binary_dilate(jnp.asarray(m), 1))
    got_e = np.asarray(M.binary_erode(jnp.asarray(m), 1))
    struct = np.ones((3, 3), bool)
    for i in range(2):
        np.testing.assert_array_equal(got_d[i], ndi.binary_dilation(m[i], struct))
        np.testing.assert_array_equal(got_e[i], ndi.binary_erosion(m[i], struct))


def test_fill_holes_matches_scipy():
    m = _blob(40, 40, 20, 20, 12) & ~_blob(40, 40, 20, 20, 5)
    got = np.asarray(_fill(jnp.asarray(m)))
    np.testing.assert_array_equal(got, ndi.binary_fill_holes(m))
    # no holes -> unchanged; also batched input
    m2 = np.stack([m, _blob(40, 40, 10, 10, 6)])
    got2 = np.asarray(_fill(jnp.asarray(m2)))
    for i in range(2):
        np.testing.assert_array_equal(got2[i], ndi.binary_fill_holes(m2[i]))


def test_connected_components_count(rng):
    m = np.zeros((30, 30), bool)
    m[2:6, 2:6] = True
    m[10:14, 10:18] = True
    m[20:22, 25:28] = True
    n = int(_ncomp(jnp.asarray(m)))
    assert n == 3
    labels = np.asarray(_ccomp(jnp.asarray(m)))
    assert (labels > 0).sum() == m.sum()
    assert len(np.unique(labels[m])) == 3
    # diagonal connection counts as one (8-connectivity)
    d = np.zeros((10, 10), bool)
    d[2, 2] = d[3, 3] = True
    assert int(_ncomp(jnp.asarray(d))) == 1


def test_largest_component():
    m = np.zeros((20, 20), bool)
    m[1:3, 1:3] = True  # 4 px
    m[8:16, 8:16] = True  # 64 px
    got = np.asarray(_lcomp(jnp.asarray(m)))
    assert got[10, 10] and not got[1, 1]
    assert got.sum() == 64


def test_is_edge_mask():
    # tile 512, overlap 0.1 -> edge width 25.6
    boxes = jnp.asarray(
        [
            [100.0, 100.0, 200.0, 200.0],  # interior
            [5.0, 100.0, 50.0, 200.0],  # touches left margin
            [100.0, 100.0, 200.0, 500.0],  # touches bottom margin
        ]
    )
    got = np.asarray(M.is_edge_mask(boxes, 512, 0.1))
    assert got.tolist() == [False, True, True]
