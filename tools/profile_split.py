"""Per-stage profile of the split serving path on the current backend.

Times the conv-pure feature program (P1) and the RoI-heads program (P2)
separately at the bench geometry, reports achieved TFLOP/s + MFU per stage,
and A/Bs heads_vectorize (map vs vmap) and tile_batch. Run on the real TPU
to decide where round-5 perf work goes (VERDICT r3 missing #5 follow-up).

Usage: python tools/profile_split.py [--batch 16] [--iters 20] [--tile 1024]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


_scalar_sum = None


def _sync(tree) -> None:
    """Force completion of everything ``tree`` depends on while moving only
    4 bytes to host: a separate jitted scalar-sum program consumes the tree
    (so it cannot start before the producing program finishes), and we pull
    its scalar. Pulling the raw outputs would time the multi-GB feature-map
    transfer over the device tunnel, not the compute."""
    global _scalar_sum
    import jax
    import jax.numpy as jnp

    if _scalar_sum is None:
        _scalar_sum = jax.jit(
            lambda t: sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(t)
                if hasattr(l, "astype")
            )
        )
    np.asarray(_scalar_sum(tree))


def _flops(jitted, *args) -> float:
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:  # noqa: BLE001
        return 0.0


def _time(fn, args, iters, warmup=3) -> float:
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--heads", default="both", choices=["map", "vmap", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _chip_peak_tflops
    from deepemia_tpu.inference.engine import TileEngine
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    platform = jax.devices()[0].platform
    peak = _chip_peak_tflops(jax)
    use_bf16 = platform != "cpu"
    model = build_model("R50", num_classes=2, use_bf16=use_bf16)
    params = init_params(model, (args.tile, args.tile), seed=0)

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        (rng.random((args.batch, args.tile, args.tile, 3)) * 255).astype(
            np.float32
        )
    )

    def report(name, sec, flops, batch):
        tflops = flops / sec / 1e12 if sec > 0 else 0.0
        mfu = 100 * tflops / peak if peak else 0.0
        print(
            f"{name:28s} {sec * 1e3:9.2f} ms/call  "
            f"{batch / sec:7.1f} tiles/s  {tflops:7.2f} TF/s  mfu {mfu:5.1f}%"
        )

    heads_modes = (
        ["map", "vmap"] if args.heads == "both" else [args.heads]
    )
    for hv in heads_modes:
        engine = TileEngine(model, params, heads_vectorize=hv)
        feats_fn, heads_fn = engine.tile_forward_programs(args.tile, args.tile)
        feats_j = jax.jit(feats_fn)
        heads_j = jax.jit(heads_fn)

        stage1 = feats_j(params, tiles)
        _sync(stage1)
        f1 = _flops(feats_j, params, tiles)
        f2 = _flops(heads_j, params, *stage1)

        t1 = _time(feats_j, (params, tiles), args.iters)
        t2 = _time(lambda p, s: heads_j(p, *s), (params, stage1), args.iters)

        print(f"-- heads_vectorize={hv} batch={args.batch} tile={args.tile}")
        report("P1 feats (conv)", t1, f1, args.batch)
        report("P2 heads (roi)", t2, f2, args.batch)

        # end-to-end pipelined, two batches in flight (the bench pattern)
        def full(p, ts):
            fs, lg, rg = feats_j(p, ts)
            return heads_j(p, fs, lg, rg)

        for _ in range(3):
            _sync(full(params, tiles).scores)
        t0 = time.perf_counter()
        pending = full(params, tiles)
        for _ in range(args.iters - 1):
            nxt = full(params, tiles)
            _sync(pending.scores)
            pending = nxt
        _sync(pending.scores)
        e2e = (time.perf_counter() - t0) / args.iters
        report("e2e pipelined", e2e, f1 + f2, args.batch)
        print()


if __name__ == "__main__":
    main()
