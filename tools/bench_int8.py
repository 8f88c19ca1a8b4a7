"""A/B: float (bf16) vs int8-quantized backbone tile serving.

Measures the engine's real serving pattern (bench.py's harness: feature
program + heads program, two batches in flight) for quant_backbone in
{none, trunk, full}, plus a detection-agreement check between the float and
int8 forwards on synthetic blob images.

v5e MXU: int8 peak is 2x bf16 (394 vs 197 TOPS), so a conv-bound tile
forward should approach +2x on the feature program. The reference's own
int8 path never ran (SURVEY Q2); this is the measurement that path never
had.

Usage: python tools/bench_int8.py [none trunk full]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 1024
BATCH = int(os.environ.get("INT8_BATCH", "16"))
ITERS = 12
WARMUP = 3


def _sync(x):
    np.asarray(x)


def _blob_image(rng, size=512, n=6):
    img = (rng.random((size, size, 3)) * 40).astype(np.float32)
    for _ in range(n):
        cy, cx = rng.integers(60, size - 60, 2)
        r = int(rng.integers(18, 45))
        yy, xx = np.mgrid[:size, :size]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[m] = 200.0 + rng.random() * 40
    return img


def main():
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.inference.engine import TileEngine
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    platform = jax.devices()[0].platform
    use_bf16 = platform != "cpu"
    modes = sys.argv[1:] or ["none", "trunk", "full"]
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        (rng.random((BATCH, TILE, TILE, 3)) * 255).astype(np.float32)
    )

    results = {}
    params = None
    for mode in modes:
        model = build_model(
            "R50", num_classes=2, use_bf16=use_bf16, quant_backbone=mode
        )
        if params is None:
            params = init_params(model, (TILE, TILE), seed=0)
        engine = TileEngine(model, params)
        if engine._resolve_serving() == "split":
            feats_j, heads_j = map(
                jax.jit, engine.tile_forward_programs(TILE, TILE)
            )

            def fn(p, ts, feats_j=feats_j, heads_j=heads_j):
                feats, lg, rg = feats_j(p, ts)
                return heads_j(p, feats, lg, rg)

        else:
            fn = jax.jit(
                lambda p, ts, engine=engine: engine._forward_tile_batch(p, ts)
            )
        for _ in range(WARMUP):
            _sync(fn(params, tiles).scores)
        t0 = time.perf_counter()
        pending = fn(params, tiles)
        for _ in range(ITERS - 1):
            nxt = fn(params, tiles)
            _sync(pending.scores)
            pending = nxt
        _sync(pending.scores)
        dt = time.perf_counter() - t0
        tps = ITERS * BATCH / dt
        results[mode] = tps
        print(f"quant={mode:6s}: {tps:8.2f} tiles/s ({platform})")

    if "none" in results:
        for m, v in results.items():
            if m != "none":
                print(f"  {m} vs none: {v / results['none']:.3f}x")

    # detection agreement: float vs int8 full forward on blob images
    if "none" in modes and len(modes) > 1:
        print("\ndetection agreement (synthetic blobs, 512^2):")
        fmodel = build_model("R50", num_classes=2, use_bf16=use_bf16)
        p512 = init_params(fmodel, (512, 512), seed=0)
        f_fwd = jax.jit(lambda p, im: fmodel.apply(p, im, score_threshold=0.3))
        for mode in [m for m in modes if m != "none"]:
            qmodel = build_model(
                "R50", num_classes=2, use_bf16=use_bf16, quant_backbone=mode
            )
            q_fwd = jax.jit(
                lambda p, im, qmodel=qmodel: qmodel.apply(
                    p, im, score_threshold=0.3
                )
            )
            agree, total = 0, 0
            brng = np.random.default_rng(1)
            for _ in range(4):
                img = jnp.asarray(_blob_image(brng))
                df = f_fwd(p512, img)
                dq = q_fwd(p512, img)
                fb = np.asarray(df.boxes)[np.asarray(df.valid)]
                qb = np.asarray(dq.boxes)[np.asarray(dq.valid)]
                total += len(fb)
                for b in fb:
                    if len(qb) == 0:
                        continue
                    ix1 = np.maximum(b[0], qb[:, 0])
                    iy1 = np.maximum(b[1], qb[:, 1])
                    ix2 = np.minimum(b[2], qb[:, 2])
                    iy2 = np.minimum(b[3], qb[:, 3])
                    inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
                    a1 = (b[2] - b[0]) * (b[3] - b[1])
                    a2 = (qb[:, 2] - qb[:, 0]) * (qb[:, 3] - qb[:, 1])
                    iou = inter / np.maximum(a1 + a2 - inter, 1e-6)
                    if iou.max() > 0.8:
                        agree += 1
            pct = 100.0 * agree / max(total, 1)
            print(
                f"  {mode}: {agree}/{total} float detections matched at "
                f"IoU>0.8 ({pct:.1f}%)"
            )


if __name__ == "__main__":
    main()
