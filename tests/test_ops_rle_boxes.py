"""Tests for RLE encoding and box ops (NMS, IoU, delta transforms)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from deepemia_tpu.ops import boxes as B
from deepemia_tpu.ops.rle import (
    rle_decode,
    rle_encode,
    rle_encode_batch_jax,
    rle_to_string,
)


def _reference_rle(x):
    """The reference's Python-loop encoder (mask_utils.py:17-35) as oracle."""
    dots = np.where(x.T.flatten() == 1)[0]
    run_lengths = []
    prev = -2
    for b in dots:
        if b > prev + 1:
            run_lengths.extend((b + 1, 0))
        run_lengths[-1] += 1
        prev = b
    return run_lengths


def test_rle_matches_reference_loop(rng):
    for _ in range(10):
        m = (rng.random((17, 23)) > 0.6).astype(np.uint8)
        assert rle_encode(m) == _reference_rle(m)
    assert rle_encode(np.zeros((5, 5))) == []
    assert rle_encode(np.ones((3, 2))) == [1, 6]


def test_rle_roundtrip(rng):
    m = rng.random((31, 19)) > 0.5
    assert (rle_decode(rle_encode(m), m.shape) == m).all()
    assert rle_to_string([1, 5, 9, 2]) == "1 5 9 2"


def test_rle_jax_batch_matches_numpy(rng):
    masks = rng.random((4, 12, 15)) > 0.55
    starts, lengths, n_runs = rle_encode_batch_jax(jnp.asarray(masks))
    for i in range(4):
        expect = rle_encode(masks[i])
        n = int(n_runs[i])
        got = []
        for j in range(n):
            got.extend([int(starts[i, j]), int(lengths[i, j])])
        assert got == expect


def test_rle_windowed_matches_full(rng):
    """The windowed encoder (global column-major runs from a per-instance
    S×S window) must reproduce the full-image paste+encode exactly for
    window-confined instances, and signal n_runs=max_runs for oversized
    ones (the pipeline's exact-host fallback)."""
    from deepemia_tpu.ops.masks import paste_masks
    from deepemia_tpu.ops.rle import rle_encode_windowed_jax

    h, w = 300, 280
    s = 64
    max_runs = 4 * max(h, w)
    probs = jnp.asarray(rng.random((5, 28, 28)).astype(np.float32))
    boxes = jnp.asarray(
        [
            [10.0, 20.0, 50.0, 62.0],  # interior
            [0.0, 0.0, 40.0, 30.0],  # image corner
            [240.0, 250.0, 275.0, 296.0],  # bottom-right edge clamp
            [5.0, 5.0, 200.0, 150.0],  # oversized -> sentinel
            [100.0, 100.0, 140.0, 140.0],  # invalid row
        ],
        jnp.float32,
    )
    valid = jnp.asarray([True, True, True, True, False])
    st, ln, nr = rle_encode_windowed_jax(
        probs, boxes, valid, (h, w), max_runs=max_runs, window=s
    )
    # oversized + invalid rows
    assert int(nr[3]) == max_runs
    assert int(nr[4]) == 0
    for i in (0, 1, 2):
        m = np.asarray(
            paste_masks(probs[i][None], boxes[i][None], h, w, 0.5)[0]
        )
        expect = rle_encode(m)
        n = int(nr[i])
        got = []
        for j in range(n):
            got.extend([int(st[i, j]), int(ln[i, j])])
        assert got == expect, f"instance {i}"


def _naive_iou(a, b):
    out = np.zeros((len(a), len(b)))
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            xx0, yy0 = max(bi[0], bj[0]), max(bi[1], bj[1])
            xx1, yy1 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(xx1 - xx0, 0) * max(yy1 - yy0, 0)
            ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
            aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
            out[i, j] = inter / (ai + aj - inter) if ai + aj - inter > 0 else 0
    return out


def test_box_iou_matrix(rng):
    a = rng.random((8, 4)) * 100
    a = np.stack([np.minimum(a[:, 0], a[:, 2]), np.minimum(a[:, 1], a[:, 3]),
                  np.maximum(a[:, 0], a[:, 2]) + 1, np.maximum(a[:, 1], a[:, 3]) + 1],
                 axis=1)
    got = np.asarray(B.box_iou_matrix(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, _naive_iou(a, a), atol=1e-5)


def _naive_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep, removed = [], set()
    iou = _naive_iou(boxes, boxes)
    for i in order:
        if i in removed:
            continue
        keep.append(i)
        for j in order:
            if j != i and j not in removed and iou[i, j] > thr:
                removed.add(j)
    return sorted(keep)


def test_nms_matches_naive(rng):
    for _ in range(5):
        n = 32
        centers = rng.random((n, 2)) * 60
        sizes = rng.random((n, 2)) * 20 + 5
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1)
        scores = rng.random(n)
        keep_mask = np.asarray(
            jax.jit(B.nms_mask, static_argnums=2)(jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32), 0.3)
        )
        assert sorted(np.flatnonzero(keep_mask).tolist()) == _naive_nms(
            boxes, scores, 0.3
        )


def test_nms_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.asarray([False, True])
    keep = np.asarray(B.nms_mask(boxes, scores, 0.5, valid=valid))
    assert keep.tolist() == [False, True]


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    classes = jnp.asarray([0, 1])
    keep = np.asarray(B.batched_nms_mask(boxes, scores, classes, 0.5))
    assert keep.tolist() == [True, True]
    same = np.asarray(B.batched_nms_mask(boxes, scores, jnp.asarray([0, 0]), 0.5))
    assert same.tolist() == [True, False]


def test_delta_roundtrip(rng):
    src = np.array([[10, 10, 50, 40], [0, 0, 30, 60]], np.float32)
    tgt = np.array([[12, 8, 55, 45], [5, 5, 20, 50]], np.float32)
    deltas = B.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    back = np.asarray(B.apply_deltas(jnp.asarray(src), deltas))
    np.testing.assert_allclose(back, tgt, atol=5e-3)


def test_containment_matrix():
    child = jnp.asarray([[10, 10, 20, 20]], jnp.float32)
    parent = jnp.asarray([[0, 0, 30, 30], [15, 0, 40, 40]], jnp.float32)
    c = np.asarray(B.box_containment_matrix(child, parent))
    np.testing.assert_allclose(c[0], [1.0, 0.5], atol=1e-6)


def test_top_k_by_score():
    scores = jnp.asarray([0.1, 0.9, 0.5, 0.7])
    valid = jnp.asarray([True, False, True, True])
    idx, new_valid = B.top_k_by_score(scores, 3, valid)
    assert np.asarray(idx).tolist()[:2] == [3, 2]
    assert np.asarray(new_valid).all()
