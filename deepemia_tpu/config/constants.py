"""Centralized default constants.

Parity surface: reference ``src/utils/constants.py`` (DefaultThresholds :12,
DefaultHyperparameters :39, ProcessingLimits :52, scale-bar ROI :71, split :81,
measurement :95), plus TPU-specific static-shape capacities that have no
reference analog (padded instance counts etc. — required because everything
under ``jit`` must have static shapes).
"""

from __future__ import annotations


class DefaultThresholds:
    """Score/IoU thresholds (reference constants.py:12-35)."""

    CONFIDENCE_DEFAULT = 0.5
    CONFIDENCE_SMALL_CLASS = 0.3
    CONFIDENCE_EVAL = 0.45
    IOU_DEDUP_TILES = 0.4
    IOU_DEDUP_CROSS_CLASS = 0.7
    IOU_LARGE_CLASS = 0.7
    IOU_SMALL_CLASS = 0.5
    CONTAINMENT_DEFAULT = 0.95
    MIN_MASK_AREA = 3
    EDGE_MASK_MARGIN = 5


class DefaultHyperparameters:
    """Training hyperparameters (reference constants.py:39-48 and
    config/config.yaml:41-59)."""

    BASE_LR = 0.00025
    IMS_PER_BATCH = 2
    WARMUP_ITERS = 1000
    GAMMA = 0.1
    BATCH_SIZE_PER_IMAGE = 64
    MAX_ITER_PER_IMAGE = 150  # auto MAX_ITER = n_train_images * this (train_model.py:137-144)
    MAX_ITER_MIN = 1000
    LR_STEP_FRACTIONS = (0.6, 0.8)  # LR decay at 60% / 80% (train_model.py:145-148)
    MOMENTUM = 0.9
    WEIGHT_DECAY = 1e-4


class ProcessingLimits:
    """Host/batching limits (reference constants.py:52-67,
    config/config.yaml:121-143)."""

    INFERENCE_BATCH_SIZE = 1
    MEASUREMENT_BATCH_SIZE = 3
    TILE_BATCH_SIZE = 8  # tiles per jitted chunk (reference feeds 1 at a time)
    MAX_WORKER_THREADS = 3
    MAX_IMAGE_DIM = 8192
    SAMPLE_IMAGES_FOR_SIZING = 5


class StaticShapes:
    """TPU static-shape capacities (no reference analog; picked so padded
    compute preserves AP — see SURVEY.md §7 'Hard parts')."""

    # RPN proposal caps (match Detectron2 zoo defaults for parity)
    PRE_NMS_TOPK_TRAIN = 2000
    PRE_NMS_TOPK_TEST = 1000
    POST_NMS_TOPK_TRAIN = 1000
    POST_NMS_TOPK_TEST = 1000
    # Final detections per forward pass (Detectron2 TEST.DETECTIONS_PER_IMAGE=100)
    MAX_DETECTIONS = 100
    # Per-image instance capacity after merging all tiles/classes/models
    MAX_INSTANCES_PER_IMAGE = 512
    # Mask head output resolution
    MASK_RESOLUTION = 28
    # Downsample stride for full-image mask IoU matrices (MXU matmul dedup)
    MASK_IOU_STRIDE = 4
    # RoIAlign sampling ratio (fixed; Detectron2 uses adaptive => dynamic shape)
    ROI_SAMPLING_RATIO = 2


class ScaleBarDefaults:
    """Scale-bar ROI + detection thresholds (reference constants.py:71-77,
    config/config.yaml:22-35)."""

    X_START_FACTOR = 0.7
    Y_START_FACTOR = 0.05
    WIDTH_FACTOR = 1.0
    HEIGHT_FACTOR = 0.05
    INTENSITY = 100
    PROXIMITY = 100
    MERGE_GAP = 15
    MIN_LINE_LENGTH = 30
    EDGE_MARGIN_FACTOR = 0.1


class SplitDefaults:
    """Dataset split (reference constants.py:81-91, datasets.py:51-54)."""

    TEST_FRACTION = 0.2
    SEED = 42


class MeasurementDefaults:
    """Measurement phase (reference constants.py:95-108)."""

    MIN_CONTOUR_AREA = 10
    CONTRAST_BINS = 256
    OVERLAY_ALPHA = 0.4


class TileDefaults:
    """Tile engine (reference config/config.yaml:106-112)."""

    TILE_SIZE = 512
    OVERLAP_RATIO = 0.1
    UPSCALE_FACTOR = 2.0
    EDGE_FILTER_ENABLED = True
    TILE_BATCH_SIZE = 8
