"""Does batching tiles through the backbone+FPN (heads still per-tile)
beat the current per-tile lax.map? Convs with batch B need no
space-to-batch rewrite and amortize weight traffic."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 1024
BATCH = 8


def main():
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.models import anchors as anchor_lib
    from deepemia_tpu.models.mask_rcnn import MaskRCNN, build_model, init_params
    from deepemia_tpu.models.rpn import select_proposals

    roi_backend = sys.argv[1] if len(sys.argv) > 1 else "xla"
    model = build_model(
        "R50", num_classes=2, use_bf16=True, roi_backend=roi_backend
    )
    print("roi_backend:", roi_backend)
    params = init_params(model, (TILE, TILE), seed=0)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray((rng.random((BATCH, TILE, TILE, 3)) * 255).astype(np.float32))

    def heads_from_feats(m: MaskRCNN, feats):
        h = w = TILE
        logits, regs = m.rpn_head({k: v[None] for k, v in feats.items()})
        feat_shapes = {k: (v.shape[0], v.shape[1]) for k, v in feats.items()}
        anchors = anchor_lib.all_anchors(feat_shapes)
        proposals = select_proposals(
            {k: v[0] for k, v in logits.items()},
            {k: v[0] for k, v in regs.items()},
            anchors,
            (h, w),
        )
        return m.roi_heads(
            {k: feats[k] for k in ("p2", "p3", "p4", "p5")},
            proposals.boxes,
            proposals.valid,
            (h, w),
            score_threshold=0.05,
        )

    def batched(p, ts):
        feats = jax.vmap(
            lambda t: model.apply(p, t, method=MaskRCNN.features)
        )(ts)
        dets = jax.lax.map(
            lambda f: model.apply(p, f, method=heads_from_feats), feats
        )
        return dets.scores.sum()

    def mapped(p, ts):
        return jax.lax.map(
            lambda t: model.apply(p, t, score_threshold=0.05), ts
        ).scores.sum()

    for name, prog in (("map", mapped), ("batched_backbone", batched)):
        fn = jax.jit(prog)
        for _ in range(3):
            np.asarray(fn(params, tiles))
        t0 = time.perf_counter()
        n = 12
        pending = fn(params, tiles)
        for _ in range(n - 1):
            nxt = fn(params, tiles)
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt * 1e3:.2f} ms / {BATCH} tiles = {BATCH / dt:.1f} tiles/s")


if __name__ == "__main__":
    main()
