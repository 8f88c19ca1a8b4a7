"""Isolate the RoIAlign backward (scatter-add) cost at train-time shapes.

Fwd-only vs fwd+bwd of multilevel_roi_align over a 512^2 image's pyramid with
the train-step ROI counts (576 box ROIs @14, 128 mask ROIs @14).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache(
    env_var="DEEPEMIA_TPU_BENCH_XLA_CACHE",
    default_base=os.path.join(
        os.path.expanduser("~"), ".cache", "deepemia_tpu_bench_xla"
    ),
)

from deepemia_tpu.models.roi_align import multilevel_roi_align


def sync(x):
    np.asarray(x)


def main():
    H = W = 512
    C = 256
    rng = np.random.default_rng(0)
    feats = {
        f"p{i}": jnp.asarray(
            rng.random((H >> i, W >> i, C), np.float32), jnp.bfloat16
        )
        for i in range(2, 6)
    }
    def boxes_of(n, lo, hi):
        xy = rng.random((n, 2)) * (W - hi)
        wh = lo + rng.random((n, 2)) * (hi - lo)
        return jnp.asarray(
            np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        )

    for tag, n, out in (("box-head", 576, 14), ("mask-head", 128, 14)):
        bx = boxes_of(n, 16, 96)

        def fwd(fs):
            return multilevel_roi_align(fs, bx, output_size=out).sum()

        g = jax.jit(jax.grad(fwd))
        f = jax.jit(fwd)
        f(feats); sync(f(feats))
        g(feats); sync(g(feats)["p2"])

        t0 = time.perf_counter()
        for _ in range(20):
            r = f(feats)
        sync(r)
        tf_ = (time.perf_counter() - t0) / 20

        t0 = time.perf_counter()
        for _ in range(20):
            r = g(feats)
        sync(r["p2"])
        tg = (time.perf_counter() - t0) / 20
        print(
            f"{tag}: fwd {tf_ * 1e3:6.2f} ms   fwd+bwd {tg * 1e3:6.2f} ms   "
            f"bwd-only ~{(tg - tf_) * 1e3:6.2f} ms  (R={n}, {out}x{out})"
        )


if __name__ == "__main__":
    main()
