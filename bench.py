"""Headline benchmark: 1024x1024 tile inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference runs 5-10 s/image on an NVIDIA L4 at
default settings — well under 1 effective 1024^2 tile/s. The rebuild target
is >= 20 tiles/s/chip on TPU v5e. vs_baseline is measured throughput / 20.
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_TILES_PER_SEC = 20.0
TILE = 1024
WARMUP = 3
ITERS = 20
BATCH = 8  # tiles per jitted batch forward


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    platform = jax.devices()[0].platform
    use_bf16 = platform != "cpu"
    model = build_model("R50", num_classes=2, use_bf16=use_bf16)
    params = init_params(model, (TILE, TILE), seed=0)

    def forward_batch(params, tiles):
        return jax.lax.map(
            lambda t: model.apply(params, t, score_threshold=0.05), tiles
        )

    fn = jax.jit(forward_batch)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        (rng.random((BATCH, TILE, TILE, 3)) * 255).astype(np.float32)
    )

    def run_once():
        out = fn(params, tiles)
        # Pull a small result to host: on some remote-device platforms
        # block_until_ready returns before execution completes, so a device
        # -> host transfer is the only trustworthy completion barrier.
        np.asarray(out.scores)

    for _ in range(WARMUP):
        run_once()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        run_once()
    elapsed = time.perf_counter() - t0

    tiles_per_sec = ITERS * BATCH / elapsed
    print(
        json.dumps(
            {
                "metric": f"tile_inference_throughput_{platform}",
                "value": round(tiles_per_sec, 3),
                "unit": "1024px_tiles_per_sec_per_chip",
                "vs_baseline": round(tiles_per_sec / TARGET_TILES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
