"""A/B: lax.map vs vmap over the chunk axis in the split-serving P2 program.

P2 (proposal selection + RoI heads) currently iterates tiles with
``jax.lax.map`` (engine.tile_forward_programs): NMS/sorts were assumed not
to batch well. Hypothesis: vmap batches the FC box head (16x1000 rows in
ONE matmul), the mask-head convs, the RoIAlign gathers, and top_k — and the
block-scan NMS vectorizes cleanly over a batch dim — so a vmapped P2 should
beat the sequential map at serving batch sizes.

Usage: python tools/bench_heads_vmap.py [map-pallas vmap-pallas map-xla vmap-xla]
Env: HV_BATCH (default 16), HV_TILE (default 1024), HV_UP (default 1024).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = int(os.environ.get("HV_TILE", "1024"))
UP = int(os.environ.get("HV_UP", "1024"))  # ts_up (model input size)
BATCH = int(os.environ.get("HV_BATCH", "16"))
ITERS = 12


def main():
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.models import anchors as anchor_lib
    from deepemia_tpu.models.mask_rcnn import MaskRCNN, build_model, init_params
    from deepemia_tpu.models.rpn import select_proposals

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        (rng.random((BATCH, TILE, TILE, 3)) * 255).astype(np.float32)
    )

    modes = sys.argv[1:] or ["map-pallas", "vmap-pallas", "map-xla", "vmap-xla"]
    results = {}
    for mode in modes:
        backend = "pallas" if mode.endswith("pallas") else "xla"
        model = build_model(
            "R50", num_classes=2, use_bf16=True, roi_backend=backend
        )
        params = init_params(model, (UP, UP), seed=0)
        model_cls = MaskRCNN

        def p1(p, ts, model=model, model_cls=model_cls):
            if UP != TILE:
                ts = jax.vmap(
                    lambda t: jax.image.resize(
                        t.astype(jnp.float32), (UP, UP, 3), "linear"
                    )
                )(ts)
            feats = jax.vmap(
                lambda t: model.apply(p, t, method=model_cls.features)
            )(ts)
            logits, regs = model.apply(
                p,
                {k: v for k, v in feats.items()},
                method=lambda m, f: m.rpn_head(f),
            )
            return feats, logits, regs

        def p2(p, feats, logits, regs, model=model, mode=mode):
            feat_shapes = {
                k: (v.shape[1], v.shape[2]) for k, v in feats.items()
            }
            anchors = anchor_lib.all_anchors(feat_shapes)

            def one(args):
                f, lg, rg = args
                proposals = select_proposals(
                    lg, rg, anchors, (UP, UP), post_nms_topk=1000
                )
                det = model.apply(
                    p,
                    {k: f[k] for k in ("p2", "p3", "p4", "p5")},
                    proposals.boxes,
                    proposals.valid,
                    (UP, UP),
                    method=lambda m, fe, bx, vl, hw: m.roi_heads(
                        fe, bx, vl, hw, score_threshold=0.05
                    ),
                )
                return det.scores.sum() + det.mask_probs.sum()

            xs = (
                feats,
                {k: v for k, v in logits.items()},
                {k: v for k, v in regs.items()},
            )
            if mode.startswith("vmap"):
                return jax.vmap(one)(xs).sum()
            return jax.lax.map(one, xs).sum()

        fns = [jax.jit(p1), jax.jit(p2)]

        def drive(p, ts):
            feats, logits, regs = fns[0](p, ts)
            return fns[1](p, feats, logits, regs)

        try:
            for _ in range(3):
                np.asarray(drive(params, tiles))
        except Exception as e:  # vmap of the Pallas call may not lower
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        # also time P2 alone (features precomputed) to isolate the heads
        feats0 = fns[0](params, tiles)
        jax.block_until_ready(feats0)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            np.asarray(fns[1](params, *feats0))
        p2_dt = (time.perf_counter() - t0) / ITERS

        t0 = time.perf_counter()
        pending = drive(params, tiles)
        for _ in range(ITERS - 1):
            nxt = drive(params, tiles)
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        dt = (time.perf_counter() - t0) / ITERS
        tps = BATCH / dt
        results[mode] = (tps, p2_dt * 1e3)
        print(
            f"{mode}: {dt * 1e3:.2f} ms / {BATCH} tiles = {tps:.1f} tiles/s"
            f"  (P2 alone {p2_dt * 1e3:.2f} ms)",
            flush=True,
        )
    print(results)


if __name__ == "__main__":
    main()
