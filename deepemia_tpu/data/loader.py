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
from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np

from deepemia_tpu.data.datasets import rasterize_annotations
from deepemia_tpu.train.augment import augment_sample, boxes_from_masks

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
    masks = rasterize_annotations(record)
    classes = np.array(
        [o["category_id"] for o in record["annotations"]], np.int32
    )

    if augment and len(masks):
        img, masks = augment_sample(img, masks, rng)

    # resize (aspect-preserving) + zero-pad to the static square train size
    h, w = img.shape[:2]
    if resize_mode == "range":
        lo, hi = int(min_size_range[0]), int(min_size_range[-1])
        chosen = int(rng.integers(lo, hi + 1)) if hi > lo else lo
        scale = min(
            chosen / min(h, w), max_size / max(h, w), train_size / max(h, w)
        )
    else:
        scale = train_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((train_size, train_size, 3), np.uint8)
    canvas[:nh, :nw] = img
    if len(masks):
        masks = np.stack(
            [
                cv2.resize(
                    m.astype(np.uint8), (nw, nh), interpolation=cv2.INTER_NEAREST
                )
                for m in masks
            ]
        ).astype(bool)
        padded_masks = np.zeros((len(masks), train_size, train_size), bool)
        padded_masks[:, :nh, :nw] = masks
        masks = padded_masks
        boxes = boxes_from_masks(masks)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        masks, boxes, classes = masks[keep], boxes[keep], classes[keep]
    else:
        boxes = np.zeros((0, 4), np.float32)

    g = max_instances
    n = min(len(boxes), g)
    out = {
        "image": canvas.astype(np.float32),
        "gt_boxes": np.zeros((g, 4), np.float32),
        "gt_classes": np.zeros((g,), np.int32),
        "gt_valid": np.zeros((g,), bool),
        "gt_masks": np.zeros((g, train_size, train_size), bool),
    }
    if n:
        out["gt_boxes"][:n] = boxes[:n]
        out["gt_classes"][:n] = classes[:n]
        out["gt_valid"][:n] = True
        out["gt_masks"][:n] = masks[:n]
    return out


class TrainLoader:
    """Infinite shuffled batch iterator with background prefetch."""

    def __init__(
        self,
        records: List[dict],
        batch_size: int,
        train_size: int = 512,
        max_instances: int = 64,
        augment: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        filter_empty: bool = True,
        resize_mode: str = "fixed",
        min_size_range=(640, 800),
        max_size: int = 1333,
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
        self.rng = np.random.default_rng(seed)
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._error: Exception | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        try:
            self._produce_loop()
        except BaseException as e:  # noqa: BLE001 - surface via the queue
            log.error("Train loader producer failed: %s", e, exc_info=True)
            self._error = e
            try:
                self._q.put(None, timeout=1.0)  # wake the consumer
            except queue.Full:
                pass

    def _produce_loop(self):
        order = self.rng.permutation(len(self.records))
        pos = 0
        while not self._stop.is_set():
            samples = []
            consecutive_failures = 0
            while len(samples) < self.batch_size:
                if pos >= len(order):
                    order = self.rng.permutation(len(self.records))
                    pos = 0
                rec = self.records[order[pos]]
                pos += 1
                s = prepare_sample(
                    rec, self.train_size, self.max_instances, self.augment,
                    self.rng, self.resize_mode, self.min_size_range,
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
            try:
                self._q.put(batch, timeout=1.0)
            except queue.Full:
                if self._stop.is_set():
                    return
                self._q.put(batch)

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
        try:
            self._q.get_nowait()
        except queue.Empty:
            pass
