"""Per-tile timing of the P2 heads program's component kernels.

The engine's split-serving P2 runs per tile under ``lax.map`` (sequential),
so ONE tile's kernel costs sum directly to the measured ~6 ms/tile P2 time
(tools/profile_split.py). This times each component on one tile's real
shapes with in-program ``lax.scan`` repetition — per-dispatch RPC latency
over the device tunnel (~20-30 ms) otherwise floors every small-kernel
measurement (see profile_heads_stages.py --reps).

Stages: N nms(≈5k RPN candidates) core | S select_proposals whole |
        R roi_align 1000×7 | B box branch whole | C fast_rcnn_inference |
        Q roi_align 100×14 | M mask branch whole

Run: python tools/profile_p2_kernels.py [--stages NSRBCQM] [--reps 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache(
    env_var="DEEPEMIA_TPU_BENCH_XLA_CACHE",
    default_base=os.path.join(
        os.path.expanduser("~"), ".cache", "deepemia_tpu_bench_xla"
    ),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--stages", default="NSRBCQM")
    ap.add_argument(
        "--backend",
        default=None,
        help="override the RoIAlign backend (pallas | xla)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepemia_tpu.config.constants import StaticShapes
    from deepemia_tpu.inference.engine import TileEngine
    from deepemia_tpu.models import anchors as anchor_lib
    from deepemia_tpu.models.heads import fast_rcnn_inference
    from deepemia_tpu.models.mask_rcnn import build_model, init_params
    from deepemia_tpu.models.rpn import select_proposals
    from deepemia_tpu.ops import boxes as box_ops
    from deepemia_tpu.models.roi_align import roi_align_dispatch

    ts = args.tile
    platform = jax.devices()[0].platform
    model = build_model("R50", num_classes=2, use_bf16=platform != "cpu")
    params = init_params(model, (ts, ts), seed=0)
    engine = TileEngine(model, params, tile_size=ts, tile_batch=1)
    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "xla"
    )
    heads_model = model.clone(roi_backend=backend)

    feats_fn, _ = engine.tile_forward_programs(ts, ts)
    rng = np.random.default_rng(0)
    tile = jnp.asarray((rng.random((1, ts, ts, 3)) * 255).astype(np.float32))
    feats, logits, regs = jax.block_until_ready(jax.jit(feats_fn)(params, tile))
    # strip the batch dim: per-tile shapes, as seen inside lax.map
    feats = {k: v[0] for k, v in feats.items()}
    logits = {k: v[0] for k, v in logits.items()}
    regs = {k: v[0] for k, v in regs.items()}
    feat_shapes = {k: (v.shape[0], v.shape[1]) for k, v in feats.items()}
    anchors = anchor_lib.all_anchors(feat_shapes)
    pyr = {k: feats[k] for k in ("p2", "p3", "p4", "p5")}

    def _scalar_of(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "astype")
        )

    def timed(name, fn, *fargs):
        reps = max(1, args.reps)

        def repeated(*a):
            def body(c, _):
                pert = jax.tree_util.tree_map(
                    lambda l: l + (c * 1e-24).astype(l.dtype)
                    if hasattr(l, "dtype")
                    and jnp.issubdtype(l.dtype, jnp.floating)
                    else l,
                    a,
                )
                out = fn(*pert)
                return _scalar_of(out) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return c

        j = jax.jit(repeated)
        np.asarray(j(*fargs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = j(*fargs)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / (args.iters * reps)
        print(f"{name:36s} {dt * 1e3:9.3f} ms/tile", flush=True)

    npost = StaticShapes.POST_NMS_TOPK_TEST
    nc = model.num_classes

    # synthetic per-tile intermediates (realistic shapes/distributions)
    n_cand = sum(
        min(StaticShapes.PRE_NMS_TOPK_TEST, int(np.prod(logits[lv].shape)))
        for lv in logits
    )
    cand_boxes = jnp.asarray(
        np.sort(rng.random((n_cand, 2, 2)) * ts, axis=1)
        .reshape(n_cand, 4)
        .astype(np.float32)
    )
    cand_scores = jnp.asarray(rng.random((n_cand,)).astype(np.float32))
    cand_levels = jnp.asarray(
        np.repeat(np.arange(5), int(np.ceil(n_cand / 5)))[:n_cand].astype(
            np.int32
        )
    )
    # REAL intermediates (one-off dispatches, not timed): the RoIAlign cost
    # depends strongly on the proposal size distribution (window DMA extents),
    # so synthetic uniform boxes misattribute — use the actual RPN output.
    props = jax.jit(
        lambda lg, rg: select_proposals(lg, rg, anchors, (ts, ts))
    )(logits, regs)
    prop_boxes = jax.block_until_ready(props.boxes)
    prop_valid = props.valid
    sc, dl = jax.jit(
        lambda f, b: heads_model.apply(
            params,
            f,
            b,
            method=lambda m, fe, bx: m.roi_heads.box_forward(
                fe, bx, backend=backend
            ),
        )
    )(pyr, prop_boxes)
    det_boxes = jax.block_until_ready(
        jax.jit(
            lambda s, d, b, v: fast_rcnn_inference(s, d, b, v, (ts, ts), 0.05)
        )(sc, dl, prop_boxes, prop_valid)[0]
    )
    wh = np.asarray(prop_boxes[:, 2:] - prop_boxes[:, :2])
    print(
        f"proposal box sides: mean {wh.mean():.1f} px, "
        f"p50 {np.median(wh):.1f}, p90 {np.percentile(wh, 90):.1f}",
        flush=True,
    )

    if "N" in args.stages:
        timed(
            f"N rpn nms core ({n_cand} cand)",
            lambda b, s: box_ops.batched_nms_mask(
                b, s, cand_levels, 0.7, valid=jnp.isfinite(s)
            ),
            cand_boxes,
            cand_scores,
        )
    if "S" in args.stages:
        timed(
            "S select_proposals whole",
            lambda lg, rg: select_proposals(lg, rg, anchors, (ts, ts)),
            logits,
            regs,
        )
    if "R" in args.stages:
        timed(
            f"R roi_align {npost}x7 ({backend})",
            lambda f, b: roi_align_dispatch(
                f, b, output_size=7, adaptive_ratio=True, backend=backend
            ),
            pyr,
            prop_boxes,
        )
    if "B" in args.stages:
        timed(
            "B box branch whole",
            lambda f, b: heads_model.apply(
                params,
                f,
                b,
                method=lambda m, fe, bx: m.roi_heads.box_forward(
                    fe, bx, backend=backend
                ),
            ),
            pyr,
            prop_boxes,
        )
    if "C" in args.stages:
        scores = jnp.asarray(
            rng.standard_normal((npost, nc + 1)).astype(np.float32)
        )
        deltas = jnp.asarray(
            (rng.standard_normal((npost, nc * 4)) * 0.1).astype(np.float32)
        )
        timed(
            "C fast_rcnn_inference",
            lambda s, d, b, v: fast_rcnn_inference(s, d, b, v, (ts, ts), 0.05),
            scores,
            deltas,
            prop_boxes,
            prop_valid,
        )
    if "Q" in args.stages:
        timed(
            f"Q roi_align 100x14 ({backend})",
            lambda f, b: roi_align_dispatch(
                f, b, output_size=14, adaptive_ratio=True, backend=backend
            ),
            pyr,
            det_boxes,
        )
    if "M" in args.stages:
        timed(
            "M mask branch whole",
            lambda f, b: heads_model.apply(
                params,
                f,
                b,
                method=lambda m, fe, bx: m.roi_heads.mask_forward(
                    fe, bx, backend=backend
                ),
            ),
            pyr,
            det_boxes,
        )


if __name__ == "__main__":
    main()
