"""Per-program timing of the split 4k tile pipeline on the live device.

Drives the engine's split schedule manually (same programs the product
compiles) and attributes steady-state time to P0 (full pass + extract),
P1 (features), P2 (heads), P3 (merge/dedup). Run on the TPU.

Usage: python tools/profile_split_4k.py [upscale]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.inference.engine import ClassSettings, TileEngine
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    upscale = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    model = build_model("R50", num_classes=2, use_bf16=True)
    params = init_params(model, (512, 512), seed=0)
    engine = TileEngine(
        model, params, tile_size=512, overlap_ratio=0.1,
        upscale_factor=upscale, serving="split",
    )
    settings = ClassSettings(
        confidence=jnp.asarray([0.5, 0.3]),
        nms_iou=jnp.asarray([0.7, 0.5]),
        min_size=jnp.asarray([25.0, 3.0]),
    )
    rng = np.random.default_rng(0)
    img = jax.device_put((rng.random((4096, 4096, 3)) * 255).astype(np.uint8))

    # compile via the public path, then introspect the cached program parts
    inst, _ = engine.infer(img, settings)
    np.asarray(inst.scores)

    # rebuild the split schedule with the same geometry to get handles
    # (identical compiles — the jit cache reuses them)
    program = engine._build_split(4096, 4096, upscale)

    # timing: monkey-instrument by re-running the internal stages.
    # The closure exposes nothing, so measure end-to-end plus a variant
    # with the engine's building blocks:
    t_total = []
    for _ in range(4):
        t0 = time.perf_counter()
        inst, _ = engine.infer(img, settings)
        np.asarray(inst.scores)
        t_total.append(time.perf_counter() - t0)
    print(f"total: {min(t_total)*1e3:.0f} ms")

    # stage attribution: time the tile programs directly
    ts, up = 512, upscale
    ts_up = int(round(ts * up))
    ts_up -= ts_up % 64
    feats_fn, heads_fn = engine.tile_forward_programs(ts, ts_up)
    f_j, h_j = jax.jit(feats_fn), jax.jit(heads_fn)
    from deepemia_tpu.ops import tiles as tile_ops

    grid = tile_ops.compute_tile_grid(4096, 4096, ts, 0.1)
    chunk = engine.tile_batch
    n_full = grid.num_tiles // chunk
    tiles = jnp.asarray(
        (rng.random((chunk, ts, ts, 3)) * 255).astype(np.float32)
    )
    out = f_j(params, tiles)
    np.asarray(out[0]["p5"])
    t0 = time.perf_counter()
    for _ in range(n_full):
        out = f_j(params, tiles)
    np.asarray(out[0]["p5"])
    t_feats = time.perf_counter() - t0

    feats, lg, rg = out
    ib = h_j(params, feats, lg, rg)
    np.asarray(ib.scores)
    t0 = time.perf_counter()
    for _ in range(n_full):
        ib = h_j(params, feats, lg, rg)
    np.asarray(ib.scores)
    t_heads = time.perf_counter() - t0

    print(
        f"tiles={grid.num_tiles} chunk={chunk}: "
        f"P1 features ~{t_feats*1e3:.0f} ms, P2 heads ~{t_heads*1e3:.0f} ms, "
        f"residual (P0 full pass + P3 merge + dispatch) "
        f"~{(min(t_total)-t_feats-t_heads)*1e3:.0f} ms"
    )


if __name__ == "__main__":
    main()
