"""A/B the full Mask R-CNN forward: roi_backend xla vs pallas on TPU."""

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

    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    rng = np.random.default_rng(0)
    tiles = jnp.asarray((rng.random((BATCH, TILE, TILE, 3)) * 255).astype(np.float32))

    args = sys.argv[1:] or ["xla", "pallas"]
    mode = "vmap" if "vmap" in args else "map"
    backends = [a for a in args if a != "vmap"]
    for backend in backends:
        model = build_model("R50", num_classes=2, use_bf16=True,
                            roi_backend=backend)
        params = init_params(model, (TILE, TILE), seed=0)
        if mode == "vmap":
            fn = jax.jit(
                lambda p, ts: jax.vmap(
                    lambda t: model.apply(p, t, score_threshold=0.05)
                )(ts).scores.sum()
            )
        else:
            fn = jax.jit(
                lambda p, ts: jax.lax.map(
                    lambda t: model.apply(p, t, score_threshold=0.05), ts
                ).scores.sum()
            )
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
        print(f"{backend}/{mode}: {dt * 1e3:.2f} ms / {BATCH} tiles = "
              f"{BATCH / dt:.1f} tiles/s")


if __name__ == "__main__":
    main()
