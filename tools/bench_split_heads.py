"""A/B: fused single-program tile serving vs a SPLIT two-program schedule.

The round-2 finding: a Mosaic (Pallas) custom call in the same XLA module
as the backbone convs suppresses XLA's space-to-batch conv rewrite and
slows the convs ~3x, so the Pallas RoIAlign kernel loses end-to-end even
though it wins in isolation. Hypothesis: splitting the forward into
  P1 = normalize + backbone + FPN + RPN-head convs   (batched, conv-pure)
  P2 = proposal selection + RoI heads (per tile)     (may contain Mosaic)
keeps P1's convs fast while P2 uses whichever RoIAlign backend is faster.
Dispatch overhead is two device calls per chunk instead of one; data stays
on device between programs.

Usage: python tools/bench_split_heads.py [fused|split-xla|split-pallas ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 1024
BATCH = int(__import__("os").environ.get("SPLIT_BATCH", "8"))
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

    modes = sys.argv[1:] or ["fused", "split-xla", "split-pallas"]
    results = {}
    for mode in modes:
        backend = "pallas" if mode.endswith("pallas") else "xla"
        model = build_model(
            "R50", num_classes=2, use_bf16=True, roi_backend=backend
        )
        params = init_params(model, (TILE, TILE), seed=0)
        model_cls = MaskRCNN

        if mode == "fused":
            def run(p, ts, model=model, model_cls=model_cls):
                feats = jax.vmap(
                    lambda t: model.apply(p, t, method=model_cls.features)
                )(ts)

                def heads(f):
                    det = model.apply(
                        p, f, (TILE, TILE), score_threshold=0.05,
                        method=model_cls.detect_from_features,
                    )
                    # consume masks too: scores alone let XLA dead-code
                    # eliminate the whole mask head
                    return det.scores.sum() + det.mask_probs.sum()

                return jax.lax.map(heads, feats).sum()

            fns = [jax.jit(run)]

            def drive(p, ts):
                return fns[0](p, ts)

        else:
            # P1: conv-pure program — features + RPN head over the batch
            def p1(p, ts, model=model, model_cls=model_cls):
                feats = jax.vmap(
                    lambda t: model.apply(p, t, method=model_cls.features)
                )(ts)
                logits, regs = model.apply(
                    p,
                    {k: v for k, v in feats.items()},
                    method=lambda m, f: m.rpn_head(f),
                )
                return feats, logits, regs

            # P2: proposal selection + RoI heads per tile (Mosaic allowed)
            def p2(p, feats, logits, regs, model=model):
                feat_shapes = {
                    k: (v.shape[1], v.shape[2]) for k, v in feats.items()
                }
                anchors = anchor_lib.all_anchors(feat_shapes)

                def one(args):
                    f, lg, rg = args
                    proposals = select_proposals(
                        lg, rg, anchors, (TILE, TILE), post_nms_topk=1000
                    )
                    det = model.apply(
                        p,
                        {k: f[k] for k in ("p2", "p3", "p4", "p5")},
                        proposals.boxes,
                        proposals.valid,
                        (TILE, TILE),
                        method=lambda m, fe, bx, vl, hw: m.roi_heads(
                            fe, bx, vl, hw, score_threshold=0.05
                        ),
                    )
                    return det.scores.sum() + det.mask_probs.sum()

                return jax.lax.map(
                    one,
                    (
                        feats,
                        {k: v for k, v in logits.items()},
                        {k: v for k, v in regs.items()},
                    ),
                ).sum()

            fns = [jax.jit(p1), jax.jit(p2)]

            def drive(p, ts):
                feats, logits, regs = fns[0](p, ts)
                return fns[1](p, feats, logits, regs)

        for _ in range(3):
            np.asarray(drive(params, tiles))
        t0 = time.perf_counter()
        pending = drive(params, tiles)
        for _ in range(ITERS - 1):
            nxt = drive(params, tiles)
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        dt = (time.perf_counter() - t0) / ITERS
        tps = BATCH / dt
        results[mode] = tps
        print(f"{mode}: {dt * 1e3:.2f} ms / {BATCH} tiles = {tps:.1f} tiles/s",
              flush=True)
    print(results)


if __name__ == "__main__":
    main()
