"""Sub-stage timing of the split-serving P2 heads program.

The tensorboard-plugin-profile converter is broken in this image
(xspace_to_tools_data missing), so this attributes P2 time by direct
per-component timing instead of trace parsing: it jits each P2
sub-stage — RPN proposal selection (top-k + level NMS), box branch
(RoIAlign + 2-FC + predictor), fast_rcnn_inference (decode + NMS +
top-k), mask branch (RoIAlign + 4conv + deconv) — vmapped over the tile
batch, and times them on realistic intermediate shapes.

Run: python tools/profile_heads_stages.py [--batch 16] [--tile 1024]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import os

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache(
    env_var="DEEPEMIA_TPU_BENCH_XLA_CACHE",
    default_base=os.path.join(
        os.path.expanduser("~"), ".cache", "deepemia_tpu_bench_xla"
    ),
)


def _sync(x, jax, jnp):
    np.asarray(
        jax.jit(
            lambda t: sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(t)
                if hasattr(l, "astype")
            )
        )(x)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--stages",
        default="ABCDP",
        help="subset of A(select) B(box) C(nms) D(mask) P(whole P2) to run",
    )
    ap.add_argument(
        "--reps",
        type=int,
        default=1,
        help="in-program lax.scan repetitions per dispatch: amortizes the "
        "per-dispatch RPC latency (dominant over a device tunnel) so stage "
        "times reflect device time, not round trips",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepemia_tpu.inference.engine import TileEngine
    from deepemia_tpu.models import anchors as anchor_lib
    from deepemia_tpu.models.mask_rcnn import MaskRCNN, build_model, init_params
    from deepemia_tpu.models.rpn import select_proposals

    ts = args.tile
    platform = jax.devices()[0].platform
    model = build_model("R50", num_classes=2, use_bf16=platform != "cpu")
    params = init_params(model, (ts, ts), seed=0)
    engine = TileEngine(model, params, tile_size=ts, tile_batch=args.batch)
    heads_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    heads_model = model.clone(roi_backend=heads_backend)

    feats_fn, heads_fn = engine.tile_forward_programs(ts, ts)
    feats_j = jax.jit(feats_fn)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        (rng.random((args.batch, ts, ts, 3)) * 255).astype(np.float32)
    )
    feats, logits, regs = jax.block_until_ready(feats_j(params, tiles))
    feat_shapes = {k: (v.shape[1], v.shape[2]) for k, v in feats.items()}
    anchors = anchor_lib.all_anchors(feat_shapes)

    def _scalar_of(tree):
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "astype")
        )

    def timed(name, fn, *fargs):
        reps = max(1, args.reps)
        if reps == 1:
            j = jax.jit(fn)
            run_args = fargs
        else:
            # Repeat the stage inside ONE program: a loop-carried scalar
            # perturbs every float input by a compile-time-unknown (and
            # numerically negligible) amount, so XLA cannot hoist the stage
            # body out of the scan, and the per-dispatch RPC latency is
            # amortized over `reps` on-device executions.
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
                c, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=reps
                )
                return c
            j = jax.jit(repeated)
            run_args = fargs
        out = j(*run_args)
        _sync(out, jax, jnp)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = j(*run_args)
        _sync(out, jax, jnp)
        dt = (time.perf_counter() - t0) / (args.iters * reps)
        print(
            f"{name:34s} {dt * 1e3:9.2f} ms/batch  "
            f"{dt * 1e3 / args.batch:7.2f} ms/tile",
            flush=True,
        )
        if reps > 1:
            # The scan-repeat program only returns the carry scalar; run one
            # extra un-repeated dispatch so downstream stages receive the
            # REAL stage output instead of silently falling back to the
            # synthetic uniform stand-ins (which misattribute RoIAlign cost).
            out = jax.jit(fn)(*fargs)
            _sync(out, jax, jnp)
        return out

    from deepemia_tpu.config.constants import StaticShapes

    pyr = {k: feats[k] for k in ("p2", "p3", "p4", "p5")}
    npost = StaticShapes.POST_NMS_TOPK_TEST
    # synthetic stand-ins so any stage subset runs without compiling the
    # stages before it (shapes/dtypes match the real intermediates)
    # sort paired coords so [x0,y0,x1,y1] has x0<=x1, y0<=y1
    syn_boxes = jnp.asarray(
        np.sort(rng.random((args.batch, npost, 2, 2)) * ts, axis=2)
        .reshape(args.batch, npost, 4)
        .astype(np.float32)
    )
    syn_valid = jnp.ones((args.batch, npost), bool)

    # stage A: RPN proposal selection per tile
    props = None
    if "A" in args.stages:

        def sel(lg, rg):
            return jax.vmap(
                lambda l, r: select_proposals(l, r, anchors, (ts, ts))
            )(lg, rg)

        props = timed("A select_proposals (RPN NMS)", sel, logits, regs)
    pboxes = props.boxes if props is not None else syn_boxes
    pvalid = props.valid if props is not None else syn_valid

    # stage B: box branch = RoIAlign(7) + BoxHead FCs + predictor
    box_out = None
    if "B" in args.stages:

        def box_fw(f, bx):
            return jax.vmap(
                lambda fe, b: heads_model.apply(
                    params,
                    fe,
                    b,
                    method=lambda m, fe_, b_: m.roi_heads.box_forward(
                        fe_, b_, backend=heads_backend
                    ),
                )
            )(f, bx)

        box_out = timed("B box branch (RoIAlign7+FC)", box_fw, pyr, pboxes)

    # stage C: fast_rcnn_inference (decode + class NMS + topk)
    det = None
    if "C" in args.stages:
        from deepemia_tpu.models.heads import fast_rcnn_inference

        if box_out is not None:
            scores, deltas = box_out
        else:
            nc = model.num_classes
            scores = jnp.asarray(
                rng.standard_normal((args.batch, npost, nc + 1)).astype(
                    np.float32
                )
            )
            deltas = jnp.asarray(
                (rng.standard_normal((args.batch, npost, nc * 4)) * 0.1).astype(
                    np.float32
                )
            )

        def fri(so, do, bx, vl):
            return jax.vmap(
                lambda s, d, b, v: fast_rcnn_inference(s, d, b, v, (ts, ts), 0.05)
            )(so, do, bx, vl)

        det = timed("C fast_rcnn_inference (NMS)", fri, scores, deltas, pboxes, pvalid)

    # stage D: mask branch = RoIAlign(14) + MaskHead on the 100 detections
    if "D" in args.stages:
        dboxes = (
            det[0]
            if det is not None
            else syn_boxes[:, : StaticShapes.MAX_DETECTIONS]
        )

        def mask_fw(f, bx):
            return jax.vmap(
                lambda fe, b: heads_model.apply(
                    params,
                    fe,
                    b,
                    method=lambda m, fe_, b_: m.roi_heads.mask_forward(
                        fe_, b_, backend=heads_backend
                    ),
                )
            )(f, bx)

        timed("D mask branch (RoIAlign14+conv)", mask_fw, pyr, dboxes)

    if "P" in args.stages:
        # whole P2 for reference, same jit
        heads_j = jax.jit(heads_fn)
        out = heads_j(params, feats, logits, regs)
        _sync(out.scores, jax, jnp)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = heads_j(params, feats, logits, regs)
        _sync(out.scores, jax, jnp)
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"{'P2 whole (engine heads_fn)':34s} {dt * 1e3:9.2f} ms/batch  "
            f"{dt * 1e3 / args.batch:7.2f} ms/tile",
            flush=True,
        )


if __name__ == "__main__":
    main()
