"""Isolated A/B: einsum backward vs windowed-RMW Pallas backward.

Train-step shapes (512 box RoIs @7, 128 mask RoIs @14 over a 512² pyramid,
bf16 features). The full-train-step A/B is impractical here — adding the
backward kernel pushes the step compile past 30 min — so this isolates the
backward programs themselves to decide whether the kernel is worth that
compile cost on real (non-tunneled) deployments.
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

from deepemia_tpu.models.roi_align import roi_align_dispatch


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

    for label, n, out in (("box(512@7)", 512, 7), ("mask(128@14)", 128, 14)):
        boxes = np.zeros((n, 4), np.float32)
        boxes[:, 0] = rng.uniform(0, W - 80, n)
        boxes[:, 1] = rng.uniform(0, H - 80, n)
        boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 80, n)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 80, n)
        boxes = jnp.asarray(boxes)

        for name, backend in (
            ("einsum-bwd", "xla_fast_grad"),
            ("kernel-bwd", "pallas_fast_grad"),
        ):
            def loss(f):
                o = roi_align_dispatch(
                    f, boxes, output_size=out, adaptive_ratio=True,
                    backend=backend,
                )
                return (o.astype(jnp.float32) ** 2).sum()

            gfn = jax.jit(jax.grad(loss))
            t0 = time.perf_counter()
            g = gfn(feats)
            np.asarray(g["p2"][0, 0, 0])
            compile_s = time.perf_counter() - t0
            reps = 30
            t0 = time.perf_counter()
            for _ in range(reps):
                g = gfn(feats)
            np.asarray(g["p2"][0, 0, 0])
            dt = (time.perf_counter() - t0) / reps
            print(
                f"{label} {name}: {dt * 1e3:8.3f} ms  "
                f"(first call incl. compile {compile_s:.1f} s)"
            )


if __name__ == "__main__":
    main()
