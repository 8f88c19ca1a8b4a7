"""Isolated RoIAlign benchmark: XLA pyramid gather vs Pallas window kernel.

Measures the box stage (N=1000 proposals, 7x7 out) and mask stage (N=100,
14x14 out) on FPN features for a 1024x1024 input — the shapes behind the
profile in ROUND1_NOTES.md #2 (box-stage RoIAlign ~4.3 ms of ~14 ms/tile).

Run on the real chip:  python tools/bench_roi.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(jnp, img=1024, c=256, n_boxes=1000, dtype=None, seed=0):
    rng = np.random.default_rng(seed)
    feats = {}
    for lvl, stride in (("p2", 4), ("p3", 8), ("p4", 16), ("p5", 32)):
        h = img // stride
        feats[lvl] = jnp.asarray(
            rng.standard_normal((h, h, c)).astype(np.float32), dtype
        )
    # realistic EM mix: mostly small boxes (level 2-3), some large
    sizes = rng.choice(
        [24, 40, 64, 96, 160, 320, 600], n_boxes, p=[0.25, 0.25, 0.2, 0.15, 0.08, 0.05, 0.02]
    ).astype(np.float32)
    ar = np.exp(rng.normal(0, 0.3, n_boxes)).astype(np.float32)
    w = sizes * ar
    h = sizes / ar
    cx = rng.uniform(0, img, n_boxes).astype(np.float32)
    cy = rng.uniform(0, img, n_boxes).astype(np.float32)
    boxes = np.stack(
        [
            np.clip(cx - w / 2, 0, img),
            np.clip(cy - h / 2, 0, img),
            np.clip(cx + w / 2, 0, img),
            np.clip(cy + h / 2, 0, img),
        ],
        axis=1,
    )
    return feats, jnp.asarray(boxes)


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(out)  # host pull: the only reliable sync over the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--img", type=int, default=1024)
    ap.add_argument("--boxes", type=int, default=1000)
    ap.add_argument("--accuracy", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--roi-k", type=int, default=0, help="rois_per_step (0=auto)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deepemia_tpu.kernels.roi_align_pallas import roi_align_pallas
    from deepemia_tpu.models.roi_align import multilevel_roi_align

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"platform={jax.devices()[0].platform} dtype={args.dtype}")

    for name, n, out_size in (("box", args.boxes, 7), ("mask", 100, 14)):
        feats, boxes = make_inputs(jnp, args.img, 256, n, dtype)

        # chain R calls inside one program and difference two chain lengths:
        # per-call dispatch+sync over the tunnel (~15-30 ms) would otherwise
        # swamp a ~4 ms kernel. Output reduced on device for the same reason.
        def chained(align, reps):
            def prog(f, b):
                def body(acc, k):
                    out = align(f, b + k)
                    return acc + out.sum(), None
                acc, _ = jax.lax.scan(
                    body, jnp.float32(0), jnp.arange(reps, dtype=jnp.float32)
                )
                return acc
            return jax.jit(prog)

        def per_call(align):
            r_lo, r_hi = 2, 22
            lo = chained(align, r_lo)
            hi = chained(align, r_hi)
            t_lo = bench(lo, feats, boxes, iters=6)
            t_hi = bench(hi, feats, boxes, iters=6)
            return (t_hi - t_lo) / (r_hi - r_lo)

        xla_align = lambda f, b: multilevel_roi_align(
            f, b, output_size=out_size, adaptive_ratio=True
        )
        pal_align = lambda f, b: roi_align_pallas(
            f, b, output_size=out_size, adaptive_ratio=True,
            rois_per_step=args.roi_k,
        )
        t_xla = per_call(xla_align)
        try:
            t_pal = per_call(pal_align)
        except Exception as e:  # noqa: BLE001
            t_pal = float("nan")
            print(f"  pallas failed: {type(e).__name__}: {e}")
        print(
            f"{name}: N={n} out={out_size}  xla={t_xla * 1e3:.3f} ms  "
            f"pallas={t_pal * 1e3:.3f} ms  speedup={t_xla / t_pal:.2f}x"
        )
        if args.accuracy:
            fx = jax.jit(
                lambda f, b: multilevel_roi_align(
                    f, b, output_size=out_size, adaptive_ratio=True
                )
            )
            fp = jax.jit(
                lambda f, b: roi_align_pallas(
                    f, b, output_size=out_size, adaptive_ratio=True
                )
            )
            a = np.asarray(fx(feats, boxes), np.float32)
            b = np.asarray(fp(feats, boxes), np.float32)
            d = np.abs(a - b)
            worst = np.unravel_index(d.argmax(), d.shape)
            print(
                f"  accuracy: max={d.max():.5f} mean={d.mean():.6f} "
                f"(scale {np.abs(a).mean():.4f}) worst roi={worst[0]} "
                f"box={np.asarray(boxes)[worst[0]].round(1).tolist()}"
            )


if __name__ == "__main__":
    main()
