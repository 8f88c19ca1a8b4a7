"""Training data loader: composed-affine geometry, packed transfer format,
multi-worker prefetch (reference build_detection_train_loader + custom_mapper
surface, train_model.py:184-187)."""

import cv2
import numpy as np
import pytest


def _rect_record(tmp_path, x0=120, y0=80, x1=260, y1=200, size=(300, 400)):
    h, w = size
    im = np.full((h, w, 3), 25, np.uint8)
    cv2.rectangle(im, (x0, y0), (x1 - 1, y1 - 1), (230, 230, 230), -1)
    p = tmp_path / "rect.png"
    cv2.imwrite(str(p), im)
    return {
        "file_name": str(p),
        "height": h,
        "width": w,
        "annotations": [
            {
                "bbox": [x0, y0, x1, y1],
                "bbox_mode": "XYXY_ABS",
                "segmentation": [[x0, y0, x1, y0, x1, y1, x0, y1]],
                "category_id": 0,
            }
        ],
    }


def test_augment_affine_image_mask_agreement(tmp_path):
    """The single composed affine moves the image and the polygon masks
    together: under random flips/rotation/brightness, pixels inside the
    rasterized mask are bright and pixels well outside are dark."""
    from deepemia_tpu.data.loader import prepare_sample
    from deepemia_tpu.train.trainer import unpack_mask_bits

    rec = _rect_record(tmp_path)
    for seed in range(5):
        rng = np.random.default_rng(seed)
        s = prepare_sample(rec, 256, 8, True, rng)
        assert s["image"].dtype == np.uint8
        assert s["gt_masks"].dtype == np.uint8  # bit-packed transfer format
        mask = np.asarray(unpack_mask_bits(s["gt_masks"]))[0]
        assert s["gt_valid"][0] and mask.any()
        gray = s["image"].mean(axis=2)
        inner = cv2.erode(mask.astype(np.uint8), np.ones((5, 5), np.uint8))
        outer = cv2.dilate(mask.astype(np.uint8), np.ones((7, 7), np.uint8))
        assert gray[inner > 0].mean() > 120  # bright content under the mask
        far = (outer == 0) & (gray > 0)  # exclude warp padding zeros
        if far.any():
            assert gray[far].mean() < 60
        # box matches the mask extent
        ys, xs = np.nonzero(mask)
        np.testing.assert_allclose(
            s["gt_boxes"][0],
            [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
            atol=1.0,
        )


def test_fixed_resize_box_scale(tmp_path):
    """augment=False keeps the plain aspect-preserving resize semantics."""
    from deepemia_tpu.data.loader import prepare_sample

    rec = _rect_record(tmp_path)
    s = prepare_sample(rec, 200, 8, False, np.random.default_rng(0))
    # long side 400 -> scale 0.5: box [120,80,260,200] -> [60,40,130,100]
    np.testing.assert_allclose(
        s["gt_boxes"][0], [60, 40, 130, 100], atol=1.5
    )


def test_multiworker_loader_batches(tmp_path):
    """Several producer threads feed one queue; batches stay well-formed and
    close() terminates cleanly."""
    from deepemia_tpu.data.loader import TrainLoader

    recs = [_rect_record(tmp_path)]
    loader = TrainLoader(
        recs, batch_size=2, train_size=128, max_instances=4, workers=3,
        seed=1,
    )
    try:
        it = iter(loader)
        for _ in range(5):
            b = next(it)
            assert b["image"].shape == (2, 128, 128, 3)
            assert b["gt_masks"].shape == (2, 4, 128, 16)
            assert b["gt_valid"][:, 0].all()
    finally:
        loader.close()


def test_loader_close_joins_all_workers(tmp_path):
    """close() must terminate EVERY producer thread, including ones parked
    in a blocking put on the full queue — with workers>=2 the old
    one-slot-drain close left all but one worker blocked forever, leaking a
    thread + multi-MB batch per train() call (one per HPO trial)."""
    import time as _time

    from deepemia_tpu.data.loader import TrainLoader

    recs = [_rect_record(tmp_path)]
    loader = TrainLoader(
        recs, batch_size=2, train_size=128, max_instances=4, workers=3,
        seed=3, prefetch=1,
    )
    # let every producer assemble a batch and park in the put loop
    next(iter(loader))
    _time.sleep(1.0)
    loader.close()
    deadline = _time.time() + 10.0
    while any(t.is_alive() for t in loader._threads):
        assert _time.time() < deadline, "producer thread leaked after close()"
        _time.sleep(0.05)


def test_single_worker_deterministic(tmp_path):
    """workers=1 with a fixed seed reproduces the exact batch stream."""
    from deepemia_tpu.data.loader import TrainLoader

    recs = [_rect_record(tmp_path)]

    def first_batches(n=3):
        loader = TrainLoader(
            recs, batch_size=1, train_size=128, max_instances=4,
            augment=True, seed=7, workers=1,
        )
        try:
            it = iter(loader)
            return [next(it) for _ in range(n)]
        finally:
            loader.close()

    a, b = first_batches(), first_batches()
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])
