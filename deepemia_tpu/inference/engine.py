"""Tile-based inference engine: one compiled program per image geometry.

Re-architecture of the reference hot path (tile_based_inference_pipeline,
inference.py:2299-2485 + run_class_specific_inference :1353-1461):

  reference                          | this engine
  -----------------------------------+----------------------------------------
  predictor() once PER CLASS per     | model forward ONCE per tile; per-class
  tile (cfg threshold rebuild each   | confidence/NMS thresholds applied as
  time, inference.py:1377-1390)      | post-hoc masking on the same outputs
  host numpy tile slicing + cv2      | static tile grid, one device gather,
  upscale per tile (:2373-2382)      | on-device jax.image.resize
  per-tile host->GPU->host sync      | everything stays on device; one padded
  (.to("cpu") at :1401)              | InstanceSet leaves per image
  O(n²) python mask IoU dedup        | low-res mask paste + MXU matmul IoU +
  (:2552-2677)                       | greedy scan under fori_loop

The per-class loop disappears because Mask R-CNN's forward is class-agnostic:
class-specific behavior in the reference is only thresholding + NMS params,
which are data here, not compile-time constants.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.config.constants import StaticShapes, TileDefaults
from deepemia_tpu.inference.detections import (
    InstanceSet,
    concat_instances,
    dedup_by_mask_iou,
    filter_instances,
)
from deepemia_tpu.models.heads import Detections
from deepemia_tpu.models.mask_rcnn import MaskRCNN
from deepemia_tpu.ops import masks as mask_ops
from deepemia_tpu.ops import tiles as tile_ops
from deepemia_tpu.ops.image import adaptive_threshold_scale, image_quality_score

log = logging.getLogger("deepemia_tpu.engine")


class ClassSettings(NamedTuple):
    """Per-class runtime thresholds, padded to num_classes (data, not
    compile-time constants — reference class_specific_settings,
    config/config.yaml:76-87)."""

    confidence: jnp.ndarray  # [C]
    nms_iou: jnp.ndarray  # [C]
    min_size: jnp.ndarray  # [C] pixels (area)


def class_settings_from_config(
    inference_settings: Dict[str, Any],
    num_classes: int,
    small_classes=None,
) -> ClassSettings:
    """``small_classes``: when given (the size-heuristic output,
    multiscale.determine_small_classes), classes WITHOUT explicit config get
    the reference's small/large defaults — confidence 0.3/0.5, NMS IoU
    0.5/0.7 (inference.py:800-816)."""
    css = inference_settings.get("class_specific_settings", {})
    conf = np.full((num_classes,), 0.5, np.float32)
    nms = np.full((num_classes,), 0.5, np.float32)
    min_size = np.zeros((num_classes,), np.float32)
    for c in range(num_classes):
        s = css.get(f"class_{c}", {})
        if small_classes is None:
            conf_default, nms_default = 0.5, 0.5
        elif c in small_classes:
            conf_default, nms_default = 0.3, 0.5
        else:
            conf_default, nms_default = 0.5, 0.7
        conf[c] = s.get("confidence_threshold", conf_default)
        nms[c] = s.get("iou_threshold", nms_default)
        min_size[c] = s.get("min_size", 0)
    return ClassSettings(jnp.asarray(conf), jnp.asarray(nms), jnp.asarray(min_size))


def detections_to_instances(det: Detections) -> InstanceSet:
    return InstanceSet(
        boxes=det.boxes,
        scores=det.scores,
        classes=det.classes,
        valid=det.valid,
        mask_probs=det.mask_probs,
    )


def apply_class_thresholds(
    inst: InstanceSet,
    settings: ClassSettings,
    quality_scale: jnp.ndarray,
) -> InstanceSet:
    """Confidence gate (auto-scaled by image quality, reference
    adaptive_confidence_threshold inference.py:288-335) + min-area gate."""
    conf = settings.confidence[inst.classes] * quality_scale
    keep = inst.scores >= conf
    w = jnp.maximum(inst.boxes[:, 2] - inst.boxes[:, 0], 0.0)
    h = jnp.maximum(inst.boxes[:, 3] - inst.boxes[:, 1], 0.0)
    area = inst.mask_probs.mean(axis=(1, 2)) * w * h  # ~pixel area
    keep &= area >= settings.min_size[inst.classes]
    return filter_instances(inst, keep)


class TileEngine:
    """Compiles and runs the whole per-image pipeline for one model.

    One ``TileEngine`` wraps (model, params). ``infer`` dispatches to a
    compiled program cached per (H, W) image geometry.
    """

    def __init__(
        self,
        model: MaskRCNN,
        params,
        tile_size: int = TileDefaults.TILE_SIZE,
        overlap_ratio: float = TileDefaults.OVERLAP_RATIO,
        upscale_factor: float = TileDefaults.UPSCALE_FACTOR,
        edge_filter: bool = True,
        dedup_iou: float = 0.4,
        capacity: int = StaticShapes.MAX_INSTANCES_PER_IMAGE,
        use_tiling: bool = True,
        mask_threshold: float = 0.5,
        dedup_stride: int = 8,
        mesh=None,
        full_pass_max_dim: int = 2048,
        confidence_mode: str = "auto",
        tile_batch: int = 16,
        serving: str = "auto",
        classes_using_tiling=None,
        heads_vectorize: str = "map",
    ):
        """``mesh``: optional 1-D ('tile',) jax.sharding.Mesh — the tile grid
        is then sharded across its devices via shard_map (spatial parallelism
        over the micrograph; collectives stitch the padded result sets).

        ``full_pass_max_dim``: the whole-image pass (reference
        inference.py:2341, for objects larger than a tile) runs at native
        resolution up to this long side; bigger images run it DOWNSCALED to
        this size instead — at 4k+ a native pass costs GBs of activations,
        while objects large enough to exceed a tile are still huge at half
        resolution (an interior object larger than a tile cannot be
        recovered from tiles alone: every partial view touches a tile edge
        and is edge-filtered). ``0`` disables the whole-image pass
        entirely (tiles-only mode, for datasets where every object fits
        in a tile — the full pass then only costs conv FLOPs); ignored
        when ``use_tiling`` is off, where the full pass is the only
        source of detections."""
        self.model = model
        if mesh is not None:
            # checkpoint-loaded params arrive committed to one device;
            # shard_map needs them addressable on every mesh device. On a
            # process-spanning mesh (multi-host pod) the committed arrays
            # are not globally addressable — stage through host memory so
            # every process provides the full (replicated) value.
            from jax.sharding import NamedSharding, PartitionSpec as P

            if jax.process_count() > 1:
                params = jax.device_get(params)
            params = jax.device_put(params, NamedSharding(mesh, P()))
        self.params = params
        self.tile_size = tile_size
        self.overlap_ratio = overlap_ratio
        self.upscale_factor = upscale_factor
        self.edge_filter = edge_filter
        self.dedup_iou = dedup_iou
        self.capacity = capacity
        self.use_tiling = use_tiling
        self.mask_threshold = mask_threshold
        self.dedup_stride = dedup_stride
        self.mesh = mesh
        self.full_pass_max_dim = full_pass_max_dim
        # tiles per backbone batch: convs see batch B instead of B sequential
        # batch-1 forwards (+10% tile throughput measured; reference knob
        # tile_batch_size, config.yaml:112)
        self.tile_batch = max(1, int(tile_batch))
        # 'auto': thresholds scale down on poor-quality images (reference
        # adaptive_confidence_threshold); 'manual': thresholds used verbatim
        self.confidence_mode = confidence_mode
        # 'fused': one XLA program per image geometry. 'split': conv-pure
        # feature program + separate RoI-heads program per tile chunk — a
        # Mosaic (Pallas) custom call in the same module as the backbone
        # convs suppresses XLA's space-to-batch rewrite (~3x slower convs),
        # so the Pallas RoIAlign only wins when the heads live in their own
        # program (measured: 78.8 fused-xla vs 97.1 split-pallas tiles/s on
        # v5e). 'auto' = split on any TPU backend — _build_split shard_maps
        # both programs over the tile mesh when one is configured — and
        # fused on CPU/GPU.
        self.serving = serving
        # restrict tile-SOURCED detections to these class ids (None = all):
        # the reference parses tile_settings.classes_using_tiling but never
        # enforces it (inference.py:548 vs :828 "for all classes"); here a
        # configured list drops tile detections of other classes in the
        # merge — they keep the full-image pass, where a big object is seen
        # whole instead of as edge-filtered tile fragments
        self.tiling_classes = (
            None
            if classes_using_tiling is None
            else tuple(int(c) for c in classes_using_tiling)
        )
        # 'map' (default): iterate tiles' RPN/RoI heads with lax.map —
        # sequential but small programs. 'vmap': batch them — one big FC
        # matmul / batched top_k; equivalence is tested on CPU
        # (tools/bench_heads_vmap.py measures which wins on TPU)
        if heads_vectorize not in ("map", "vmap"):
            raise ValueError(f"heads_vectorize: {heads_vectorize!r}")
        self.heads_vectorize = heads_vectorize
        self._compiled: Dict[Tuple, Any] = {}

    def _iter_tiles(self, fn, xs):
        """Apply ``fn`` across the leading tile axis of ``xs`` per the
        configured strategy."""
        if self.heads_vectorize == "vmap":
            return jax.vmap(fn)(xs)
        return jax.lax.map(fn, xs)

    # -- single forward on a fixed-size input -------------------------------

    def _forward(self, params, image: jnp.ndarray) -> InstanceSet:
        det = self.model.apply(params, image, score_threshold=0.05)
        return detections_to_instances(det)

    def _forward_tile_batch(self, params, tiles_up: jnp.ndarray) -> InstanceSet:
        """[B,H,W,3] -> InstanceSet with leading batch dim: the backbone+FPN
        run over the whole batch (efficient batched convs), the RPN/RoI
        heads per tile (their NMS/sorts do not batch well)."""
        hw = (tiles_up.shape[1], tiles_up.shape[2])
        model_cls = type(self.model)
        feats = jax.vmap(
            lambda t: self.model.apply(params, t, method=model_cls.features)
        )(tiles_up)

        def heads(f):
            det = self.model.apply(
                params,
                f,
                hw,
                score_threshold=0.05,
                method=model_cls.detect_from_features,
            )
            return detections_to_instances(det)

        return self._iter_tiles(heads, feats)

    def _finish_batch(
        self, inst_b: InstanceSet, offs_b, ok_b, ts: int, scale: float,
        h: int, w: int,
    ) -> InstanceSet:
        """Edge filter + tile->global coords, vectorized over a [B,D,...]
        batch of per-tile instance sets (shared by the fused and split
        serving paths)."""
        local = inst_b.boxes / scale  # [B,D,4] tile units
        keep = jnp.ones(local.shape[:2], bool)
        if self.edge_filter:
            b, d = local.shape[:2]
            edge = mask_ops.is_edge_mask(
                local.reshape(-1, 4), ts, self.overlap_ratio
            ).reshape(b, d)
            # never drop instances at the global image border: their tile
            # edge IS the image edge (the reference drops them — a
            # deliberate fix, SURVEY.md Q-class)
            gx0 = local[..., 0] + offs_b[:, None, 0]
            gy0 = local[..., 1] + offs_b[:, None, 1]
            gx1 = local[..., 2] + offs_b[:, None, 0]
            gy1 = local[..., 3] + offs_b[:, None, 1]
            at_border = (
                (gx0 <= 2.0)
                | (gy0 <= 2.0)
                | (gx1 >= w - 2.0)
                | (gy1 >= h - 2.0)
            )
            keep = ~edge | at_border
        if self.tiling_classes is not None:
            ids = jnp.asarray(self.tiling_classes, jnp.int32)
            keep = keep & (inst_b.classes[..., None] == ids).any(-1)
        gboxes = tile_ops.tile_boxes_to_global(
            inst_b.boxes, offs_b, scale=scale
        )
        return inst_b._replace(
            boxes=gboxes,
            valid=inst_b.valid & keep & ok_b[:, None],
        )

    # -- the traced whole-image program ------------------------------------

    def _build(self, h: int, w: int, up: Optional[float] = None):
        ts = self.tile_size
        up = self.upscale_factor if up is None else up
        ts_up = int(round(ts * up))
        # model inputs must be /64 for FPN p6
        ts_up -= ts_up % 64
        grid = tile_ops.compute_tile_grid(h, w, ts, self.overlap_ratio)
        # full-image pass at /64-padded geometry
        fh = h + (-h) % 64
        fw = w + (-w) % 64

        tiling = self.use_tiling and grid.num_tiles > 1
        # full_pass_max_dim == 0: tiles-only mode — unless tiling is
        # degenerate (one tile / disabled), where the full pass is the only
        # detection source and stays on
        full_pass = self.full_pass_max_dim > 0 or not tiling
        # without tiling (disabled or single-tile grid) the full pass runs
        # native whatever the cap: it is the only detection source
        native_full = max(h, w) <= self.full_pass_max_dim or not tiling
        if full_pass and not native_full:
            # downscaled full pass: /64-legal geometry at the cap
            ds = self.full_pass_max_dim / max(h, w)
            dh = max(64, int(round(h * ds / 64)) * 64)
            dw = max(64, int(round(w * ds / 64)) * 64)

        def program(params, image, settings: ClassSettings):
            quality = image_quality_score(image)
            if self.confidence_mode == "manual":
                qscale = jnp.float32(1.0)
            else:
                qscale = adaptive_threshold_scale(quality)

            parts = []
            if not full_pass:
                pass
            elif native_full:
                padded = jnp.pad(image, ((0, fh - h), (0, fw - w), (0, 0)))
                parts.append(self._forward(params, padded))
            else:
                small = jax.image.resize(
                    image.astype(jnp.float32), (dh, dw, 3), "linear"
                )
                inst = self._forward(params, small)
                back = jnp.asarray(
                    [w / dw, h / dh, w / dw, h / dh], jnp.float32
                )
                parts.append(inst._replace(boxes=inst.boxes * back))
            if tiling:
                tiles = tile_ops.extract_tiles(image, grid)  # [T,ts,ts,3]
                scale = ts_up / ts

                def finish_batch(inst_b: InstanceSet, offs_b, ok_b):
                    return self._finish_batch(
                        inst_b, offs_b, ok_b, ts, scale, h, w
                    )

                def run_tiles(tiles_, offsets_, ok_):
                    """Chunked tile processing: backbone over batches of
                    ``tile_batch`` tiles, heads per tile, tail vectorized.
                    Returns a FLAT InstanceSet over all (padded) tiles."""
                    t = tiles_.shape[0]
                    chunk = min(self.tile_batch, t)
                    pad = (-t) % chunk
                    if pad:
                        tiles_ = jnp.pad(
                            tiles_, ((0, pad), (0, 0), (0, 0), (0, 0))
                        )
                        offsets_ = jnp.pad(offsets_, ((0, pad), (0, 0)))
                        ok_ = jnp.pad(ok_, (0, pad))
                    n_chunks = (t + pad) // chunk
                    tiles_c = tiles_.reshape(n_chunks, chunk, ts, ts, 3)
                    offs_c = offsets_.reshape(n_chunks, chunk, 2)
                    ok_c = ok_.reshape(n_chunks, chunk)

                    def do_chunk(args):
                        tc, oc, okc = args
                        ups = jax.vmap(
                            lambda tile: jax.image.resize(
                                tile.astype(jnp.float32),
                                (ts_up, ts_up, 3),
                                "linear",
                            )
                        )(tc)
                        inst_b = self._forward_tile_batch(params, ups)
                        return finish_batch(inst_b, oc, okc)

                    insts = jax.lax.map(do_chunk, (tiles_c, offs_c, ok_c))
                    # [n_chunks, chunk, D, ...] -> [n_chunks*chunk*D, ...]
                    return InstanceSet(
                        boxes=insts.boxes.reshape(-1, 4),
                        scores=insts.scores.reshape(-1),
                        classes=insts.classes.reshape(-1),
                        valid=insts.valid.reshape(-1),
                        mask_probs=insts.mask_probs.reshape(
                            -1, *insts.mask_probs.shape[3:]
                        ),
                    )

                offsets = jnp.asarray(grid.offsets, jnp.float32)
                tile_ok = jnp.ones((grid.num_tiles,), bool)
                if self.mesh is not None and grid.num_tiles > 1:
                    # shard the tile axis across the mesh: pad the grid to a
                    # multiple of the device count (padded tiles carry
                    # tile_ok=False so their detections are discarded), run
                    # the chunked processing per shard, let GSPMD stitch
                    from jax.sharding import PartitionSpec as P

                    n_dev = self.mesh.size
                    pad_t = (-grid.num_tiles) % n_dev
                    if pad_t:
                        tiles = jnp.pad(
                            tiles, ((0, pad_t), (0, 0), (0, 0), (0, 0))
                        )
                        offsets = jnp.pad(offsets, ((0, pad_t), (0, 0)))
                        tile_ok = jnp.pad(tile_ok, (0, pad_t))

                    flat = jax.shard_map(
                        run_tiles,
                        mesh=self.mesh,
                        in_specs=(P("tile"), P("tile"), P("tile")),
                        out_specs=P("tile"),
                        check_vma=False,
                    )(tiles, offsets, tile_ok)
                else:
                    flat = run_tiles(tiles, offsets, tile_ok)
                parts.append(flat)

            if not parts:
                from deepemia_tpu.inference.detections import empty_instances

                parts = [empty_instances(self.capacity)]
            merged = concat_instances(parts, self.capacity)
            merged = apply_class_thresholds(merged, settings, qscale)
            # cross-source dedup: per-class NMS threshold = max(class nms,
            # tile-dedup threshold is the stricter reference behavior at 0.4)
            # dedup grid capped at ~512 cells/side: IoU on a coarser lattice
            # for 4k+ images stays within pixel-quantization error while the
            # low-res paste shrinks 16x
            stride = max(self.dedup_stride, -(-max(h, w) // 512))
            merged = dedup_by_mask_iou(
                merged,
                (h, w),
                self.dedup_iou,
                stride=stride,
                class_aware=True,
            )
            return merged, quality

        if self.mesh is not None:
            # explicit replication of the (small) result set: on a
            # process-spanning mesh every host must be able to read it
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.jit(
                program, out_shardings=NamedSharding(self.mesh, P())
            )
        return jax.jit(program)

    # -- split serving: conv-pure feature program + Pallas heads program ----

    def _resolve_serving(self) -> str:
        if self.serving != "auto":
            return self.serving
        return "split" if jax.default_backend() == "tpu" else "fused"

    def tile_forward_programs(self, ts: int, ts_up: int):
        """The split serving path's two per-chunk stages (unjitted):

          feats_fn(params, tiles [B,ts,ts,3]) ->
              (feats {lv: [B,h,w,C]}, rpn logits, rpn deltas)
              — upscale + backbone + FPN + RPN-head: conv-pure, no Mosaic
          heads_fn(params, feats, logits, regs) -> InstanceSet [B,D,...]
              — proposal selection + RoI heads (Pallas RoIAlign on TPU)

        Shared by ``_build_split`` and the benchmark harness so the
        measured serving pattern IS the product serving pattern.
        """
        from deepemia_tpu.models import anchors as anchor_lib
        from deepemia_tpu.models.rpn import select_proposals

        heads_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        heads_model = self.model.clone(roi_backend=heads_backend)
        model_cls = type(self.model)

        def feats_fn(params, tiles_c):
            if ts_up != ts:
                tiles_c = jax.vmap(
                    lambda t: jax.image.resize(
                        t.astype(jnp.float32), (ts_up, ts_up, 3), "linear"
                    )
                )(tiles_c)
            feats = jax.vmap(
                lambda t: self.model.apply(params, t, method=model_cls.features)
            )(tiles_c)
            logits, regs = self.model.apply(
                params,
                {k: v for k, v in feats.items()},
                method=lambda m, f: m.rpn_head(f),
            )
            return feats, logits, regs

        def heads_fn(params, feats, logits, regs):
            feat_shapes = {
                k: (v.shape[1], v.shape[2]) for k, v in feats.items()
            }
            anchors = anchor_lib.all_anchors(feat_shapes)

            def one(args):
                f, lg, rg = args
                proposals = select_proposals(lg, rg, anchors, (ts_up, ts_up))
                det = heads_model.apply(
                    params,
                    {k: f[k] for k in ("p2", "p3", "p4", "p5")},
                    proposals.boxes,
                    proposals.valid,
                    (ts_up, ts_up),
                    method=lambda m, fe, bx, vl, hw: m.roi_heads(
                        fe, bx, vl, hw, score_threshold=0.05
                    ),
                )
                return detections_to_instances(det)

            return self._iter_tiles(
                one,
                (
                    feats,
                    {k: v for k, v in logits.items()},
                    {k: v for k, v in regs.items()},
                ),
            )

        return feats_fn, heads_fn

    def _build_split(self, h: int, w: int, up: Optional[float] = None):
        """Host-driven multi-program schedule with identical semantics to
        the fused program:

          P0  full pass (+ quality + tile extraction)   [conv XLA]
          P1  per chunk: upscale + backbone/FPN + RPN    [conv XLA, batched]
          P2  per chunk: proposals + RoI heads + edge    [Mosaic allowed]
          P3  concat + class thresholds + global dedup

        Keeping the Mosaic custom call out of P0/P1 preserves XLA's
        space-to-batch conv rewrite; P2 then takes the Pallas RoIAlign win
        (97.1 vs 78.8 tiles/s measured on v5e, tools/bench_split_heads.py).
        All arrays stay on device between programs.

        With a ('tile',) mesh, each outer iteration processes
        ``mesh.size * tile_batch`` tiles: P1 and P2 are shard_mapped over
        the mesh (every device runs its own chunk; no cross-device comm
        until the merge program), so the split-serving win carries to
        multi-chip pods.
        """
        ts = self.tile_size
        up_f = self.upscale_factor if up is None else up
        ts_up = int(round(ts * up_f))
        ts_up -= ts_up % 64
        grid = tile_ops.compute_tile_grid(h, w, ts, self.overlap_ratio)
        fh = h + (-h) % 64
        fw = w + (-w) % 64
        tiling = self.use_tiling and grid.num_tiles > 1
        # see _build: 0 disables the whole-image pass unless tiling is
        # degenerate (then it is the only detection source)
        full_pass = self.full_pass_max_dim > 0 or not tiling
        native_full = max(h, w) <= self.full_pass_max_dim or not tiling
        if full_pass and not native_full:
            ds = self.full_pass_max_dim / max(h, w)
            dh = max(64, int(round(h * ds / 64)) * 64)
            dw = max(64, int(round(w * ds / 64)) * 64)
        scale = ts_up / ts
        n_dev = self.mesh.size if self.mesh is not None else 1
        chunk = min(self.tile_batch, max(-(-grid.num_tiles // n_dev), 1))
        group = chunk * n_dev  # tiles per outer iteration
        pad_t = (-grid.num_tiles) % group if tiling else 0
        n_chunks = (grid.num_tiles + pad_t) // group if tiling else 0

        def p0(params, image):
            quality = image_quality_score(image)
            if self.confidence_mode == "manual":
                qscale = jnp.float32(1.0)
            else:
                qscale = adaptive_threshold_scale(quality)
            if not full_pass:
                from deepemia_tpu.inference.detections import empty_instances

                full_inst = empty_instances(self.capacity)
            elif native_full:
                padded = jnp.pad(image, ((0, fh - h), (0, fw - w), (0, 0)))
                full_inst = self._forward(params, padded)
            else:
                small = jax.image.resize(
                    image.astype(jnp.float32), (dh, dw, 3), "linear"
                )
                inst = self._forward(params, small)
                back = jnp.asarray(
                    [w / dw, h / dh, w / dw, h / dh], jnp.float32
                )
                full_inst = inst._replace(boxes=inst.boxes * back)
            if tiling:
                tiles = tile_ops.extract_tiles(image, grid)
                if pad_t:
                    tiles = jnp.pad(
                        tiles, ((0, pad_t), (0, 0), (0, 0), (0, 0))
                    )
                tiles = tiles.reshape(n_chunks, group, ts, ts, tiles.shape[-1])
            else:
                tiles = jnp.zeros((0,))
            return full_inst, quality, qscale, tiles

        feats_fn, heads_fn = self.tile_forward_programs(ts, ts_up)

        def p1(params, tiles_c):
            return feats_fn(params, tiles_c)

        def p2(params, feats, logits, regs, offs_c, ok_c):
            inst_b = heads_fn(params, feats, logits, regs)
            return self._finish_batch(inst_b, offs_c, ok_c, ts, scale, h, w)

        if self.mesh is not None:
            # shard the group's tile axis: each device runs its own chunk of
            # the conv program and heads program independently
            from jax.sharding import PartitionSpec as P

            p1 = jax.shard_map(
                p1,
                mesh=self.mesh,
                in_specs=(P(), P("tile")),
                out_specs=(P("tile"), P("tile"), P("tile")),
                check_vma=False,
            )
            p2 = jax.shard_map(
                p2,
                mesh=self.mesh,
                in_specs=(P(), P("tile"), P("tile"), P("tile"), P("tile"),
                          P("tile")),
                out_specs=P("tile"),
                check_vma=False,
            )

        def p3(parts, settings, qscale):
            merged = concat_instances(list(parts), self.capacity)
            merged = apply_class_thresholds(merged, settings, qscale)
            stride = max(self.dedup_stride, -(-max(h, w) // 512))
            return dedup_by_mask_iou(
                merged,
                (h, w),
                self.dedup_iou,
                stride=stride,
                class_aware=True,
            )

        if self.mesh is not None:
            # P0's outputs (incl. the tile stack, which later feeds the
            # P("tile")-spec'd P1) and P3's merged result are replicated:
            # required for host reads on every process of a multi-host
            # mesh, and cheap — the big intermediates (P1 feats / P2
            # instance sets) stay tile-sharded between programs.
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            p0_j = jax.jit(p0, out_shardings=rep)
            p3_j = jax.jit(p3, out_shardings=rep)
        else:
            p0_j = jax.jit(p0)
            p3_j = jax.jit(p3)
        p1_j = jax.jit(p1)
        p2_j = jax.jit(p2)

        # static per-chunk offsets/validity from the (static) grid
        if tiling:
            offs = np.asarray(grid.offsets, np.float32)
            ok = np.ones((grid.num_tiles,), bool)
            if pad_t:
                offs = np.pad(offs, ((0, pad_t), (0, 0)))
                ok = np.pad(ok, (0, pad_t))
            offs_c = offs.reshape(n_chunks, group, 2)
            ok_c = ok.reshape(n_chunks, group)

        def program(params, image, settings):
            full_inst, quality, qscale, tiles = p0_j(params, image)
            parts = [full_inst]
            if tiling:
                for i in range(n_chunks):
                    feats, logits, regs = p1_j(params, tiles[i])
                    flat = p2_j(
                        params, feats, logits, regs, offs_c[i], ok_c[i]
                    )
                    # chunk sets arrive [chunk, D, ...]: flatten rows
                    parts.append(
                        InstanceSet(
                            boxes=flat.boxes.reshape(-1, 4),
                            scores=flat.scores.reshape(-1),
                            classes=flat.classes.reshape(-1),
                            valid=flat.valid.reshape(-1),
                            mask_probs=flat.mask_probs.reshape(
                                -1, *flat.mask_probs.shape[2:]
                            ),
                        )
                    )
            merged = p3_j(tuple(parts), settings, qscale)
            return merged, quality

        return program

    def infer(
        self,
        image: np.ndarray,
        settings: ClassSettings,
        upscale: Optional[float] = None,
    ) -> Tuple[InstanceSet, Any]:
        """Run the compiled pipeline for an [H,W,3] uint8/float BGR image.

        ``upscale`` overrides the configured tile upscale factor for this
        call (class-conditional upscale: when the size heuristic finds no
        small classes, the pipeline passes 1.0 — native-resolution tiles
        quarter the conv FLOPs of the default x2)."""
        h, w = int(image.shape[0]), int(image.shape[1])
        eff_up = self.upscale_factor if upscale is None else upscale
        serving = self._resolve_serving()
        key = (h, w, eff_up, serving)
        if key not in self._compiled:
            log.info(
                "Compiling tile pipeline for %dx%d image (upscale %.2g, %s)",
                h, w, eff_up, serving,
            )
            self._compiled[key] = (
                self._build_split(h, w, eff_up)
                if serving == "split"
                else self._build(h, w, eff_up)
            )
        # keep the native dtype for the host->device transfer (uint8 images
        # move 4x less data than f32; the program casts on device)
        if self.mesh is not None:
            # replicate over the mesh in ONE transfer: device_put of the
            # host array straight to the replicated sharding (jnp.asarray
            # first would commit to device 0 and reshard = two transfers).
            # On a process-spanning mesh a committed single-device array is
            # not reshardable from host code, so go through numpy there.
            from jax.sharding import NamedSharding, PartitionSpec as P

            if isinstance(image, jax.Array) and jax.process_count() > 1:
                image = np.asarray(image)
            image = jax.device_put(image, NamedSharding(self.mesh, P()))
        else:
            image = jnp.asarray(image)
        inst, quality = self._compiled[key](self.params, image, settings)
        # quality stays a device scalar: forcing float() here would make
        # every infer() a host sync, serializing multi-dispatch callers
        # (the multiscale ladder, ensembles) on the device round trip.
        # Callers that need a Python float get one lazily via float(q).
        return inst, quality


def cross_class_dedup(
    inst: InstanceSet, image_hw, iou_threshold: float = 0.7, stride: int = 8
) -> InstanceSet:
    """Class-agnostic dedup pass (reference inference.py:859-864 at IoU 0.7)."""
    return dedup_by_mask_iou(
        inst, image_hw, iou_threshold, stride=stride, class_aware=False
    )
