"""Training data loader: records -> padded device-ready batches.

Replaces the reference's Detectron2 ``build_detection_train_loader`` +
``custom_mapper`` path (train_model.py:184-187) with a host-side numpy
pipeline: decode, augment (optional), resize/pad to a static train size,
rasterize polygon masks, pad GT to a fixed capacity — then a background
prefetch thread keeps one batch in flight so host decode overlaps device
compute (the double-buffering SURVEY.md §7 calls for).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np

from deepemia_tpu.train.augment import boxes_from_masks, sample_augment_affine

log = logging.getLogger("deepemia_tpu.loader")


def prepare_sample(
    record: dict,
    train_size: int,
    max_instances: int,
    augment: bool,
    rng: np.random.Generator,
    resize_mode: str = "fixed",
    min_size_range=(640, 800),
    max_size: int = 1333,
) -> Optional[Dict[str, np.ndarray]]:
    """One record -> fixed-shape arrays (or None if the image is unreadable).

    ``resize_mode='fixed'``: long side scaled to ``train_size`` (square
    canvas). ``'range'``: Detectron2's training-resize schedule
    (ResizeShortestEdge: short side sampled from ``min_size_range``, long
    side capped at ``max_size``) reproduced inside the STATIC
    ``train_size`` canvas — the per-sample scale is
    min(chosen/short, max_size/long, train_size/long), so XLA sees one
    shape while the object-scale distribution matches the reference
    (train_model.py zoo-config INPUT.MIN_SIZE_TRAIN 640-800 / MAX 1333).
    Pick ``train_size`` >= the largest intended long side for full effect.
    """
    img = cv2.imread(record["file_name"], cv2.IMREAD_COLOR)
    if img is None:
        log.warning("Unreadable image: %s", record["file_name"])
        return None
    annos = record["annotations"]
    classes = np.array([o["category_id"] for o in annos], np.int32)

    # One composed affine (flips -> rotation -> resize scale) applied once to
    # the image and to the polygon COORDINATES — masks are then rasterized
    # directly at final resolution (single fillPoly per instance, no
    # full-res rasterize + per-mask warp + per-mask resize chain, and no
    # double nearest-neighbor resampling of mask boundaries).
    h, w = img.shape[:2]
    geo = np.eye(3)
    brightness = None
    if augment and annos:
        geo, brightness = sample_augment_affine(h, w, rng)

    if resize_mode == "range":
        lo, hi = int(min_size_range[0]), int(min_size_range[-1])
        chosen = int(rng.integers(lo, hi + 1)) if hi > lo else lo
        scale = min(
            chosen / min(h, w), max_size / max(h, w), train_size / max(h, w)
        )
    else:
        scale = train_size / max(h, w)
    # match cv2.resize's pixel-center convention: dst = s*src + (s-1)/2
    off = (scale - 1.0) / 2.0
    geo = np.array(
        [[scale, 0, off], [0, scale, off], [0, 0, 1]], np.float64
    ) @ geo

    canvas = cv2.warpAffine(
        img, geo[:2], (train_size, train_size), flags=cv2.INTER_LINEAR
    )
    if brightness is not None:
        canvas = cv2.convertScaleAbs(canvas, alpha=brightness)

    if annos:
        masks = np.zeros((len(annos), train_size, train_size), np.uint8)
        for i, obj in enumerate(annos):
            for poly in obj["segmentation"]:
                pts = np.asarray(poly, np.float64).reshape(-1, 2)
                pts = pts @ geo[:2, :2].T + geo[:2, 2]
                cv2.fillPoly(masks[i], [np.round(pts).astype(np.int32)], 1)
        masks = masks.astype(bool)
        boxes = boxes_from_masks(masks)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        masks, boxes, classes = masks[keep], boxes[keep], classes[keep]
    else:
        masks = np.zeros((0, train_size, train_size), bool)
        boxes = np.zeros((0, 4), np.float32)

    g = max_instances
    n = min(len(boxes), g)
    # Transfer-packed formats: image stays uint8 (4x fewer bytes than f32;
    # the model's normalize() casts on device) and masks are bit-packed
    # along W (8x; trainer.unpack_mask_bits restores them on device). The
    # padded [G,H,W] bool tensor dominated the step time measured over the
    # axon tunnel: 33.5 MB/step at B=2/G=64/512^2 was ~45 ms of host->device
    # transfer against a 2.9 ms device step (tools/profile_train_step.py).
    assert train_size % 8 == 0, "train_size must be a multiple of 8"
    out = {
        "image": canvas,
        "gt_boxes": np.zeros((g, 4), np.float32),
        "gt_classes": np.zeros((g,), np.int32),
        "gt_valid": np.zeros((g,), bool),
        "gt_masks": np.zeros((g, train_size, train_size // 8), np.uint8),
    }
    if n:
        out["gt_boxes"][:n] = boxes[:n]
        out["gt_classes"][:n] = classes[:n]
        out["gt_valid"][:n] = True
        out["gt_masks"][:n] = np.packbits(masks[:n], axis=-1)
    return out


class TrainLoader:
    """Infinite shuffled batch iterator with background prefetch.

    ``workers`` producer threads (reference DATALOADER.NUM_WORKERS
    equivalent) each draw from their own seeded permutation stream and
    assemble whole batches; with one worker the batch sequence is fully
    deterministic for a given seed, with several the sample distribution is
    identical but batch *order* interleaves by thread timing (cv2/numpy
    release the GIL for the heavy ops, so threads scale on real cores).
    """

    def __init__(
        self,
        records: List[dict],
        batch_size: int,
        train_size: int = 512,
        max_instances: int = 64,
        augment: bool = False,
        seed: int = 0,
        prefetch: int = 4,
        filter_empty: bool = True,
        resize_mode: str = "fixed",
        min_size_range=(640, 800),
        max_size: int = 1333,
        workers: int = 2,
    ):
        if filter_empty:  # reference DATALOADER.FILTER_EMPTY_ANNOTATIONS=True
            records = [r for r in records if r.get("annotations")]
        if not records:
            raise ValueError("No records with annotations to train on")
        self.records = records
        self.batch_size = batch_size
        self.train_size = train_size
        self.max_instances = max_instances
        self.augment = augment
        self.resize_mode = resize_mode
        self.min_size_range = min_size_range
        self.max_size = max_size
        self._q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, workers))
        self._error: Exception | None = None
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._producer,
                args=(np.random.default_rng(seed + 1000003 * wid),),
                daemon=True,
            )
            for wid in range(max(1, workers))
        ]
        for t in self._threads:
            t.start()

    def _producer(self, rng: np.random.Generator):
        try:
            self._produce_loop(rng)
        except BaseException as e:  # noqa: BLE001 - surface via the queue
            log.error("Train loader producer failed: %s", e, exc_info=True)
            self._error = e
            try:
                self._q.put(None, timeout=1.0)  # wake the consumer
            except queue.Full:
                pass

    def _produce_loop(self, rng: np.random.Generator):
        order = rng.permutation(len(self.records))
        pos = 0
        while not self._stop.is_set():
            samples = []
            consecutive_failures = 0
            while len(samples) < self.batch_size:
                if pos >= len(order):
                    order = rng.permutation(len(self.records))
                    pos = 0
                rec = self.records[order[pos]]
                pos += 1
                s = prepare_sample(
                    rec, self.train_size, self.max_instances, self.augment,
                    rng, self.resize_mode, self.min_size_range,
                    self.max_size,
                )
                if s is not None:
                    samples.append(s)
                    consecutive_failures = 0
                else:
                    consecutive_failures += 1
                    if consecutive_failures > 2 * len(self.records):
                        raise RuntimeError(
                            "no readable training samples: every record "
                            "failed to load/prepare"
                        )
            batch = {
                k: np.stack([s[k] for s in samples]) for k in samples[0]
            }
            # bounded-wait put loop: an UNtimed put here can park this
            # thread forever if close() races the stop check — with
            # workers>=2, close() used to unblock only one producer and
            # leak the rest (plus their multi-MB batches) for the life of
            # the process (one leak per train() call under HPO)
            while True:
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    if self._stop.is_set():
                        return

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            item = self._q.get()
            if item is None or self._error is not None:
                raise RuntimeError(
                    "training data producer failed"
                ) from self._error
            yield item

    def close(self):
        self._stop.set()
        # drain so producers parked in put() see a free slot quickly, then
        # join each worker (their timed-put loop re-checks _stop <=0.5s)
        deadline = time.time() + 5.0
        for t in self._threads:
            while t.is_alive() and time.time() < deadline:
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.05)
