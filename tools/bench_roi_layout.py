"""Diagnostic: RoIAlign cost when features are conv-produced inside the same
program (realistic layouts) vs passed as jit inputs (XLA picks layouts)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.kernels.roi_align_pallas import roi_align_pallas
    from deepemia_tpu.models.roi_align import multilevel_roi_align
    from tools.bench_roi import make_inputs

    feats, boxes = make_inputs(jnp, 1024, 256, 1000, jnp.bfloat16)
    kernels = {
        lvl: jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 1, 256, 256)) * 0.06,
            jnp.bfloat16,
        )
        for lvl in feats
    }

    def convd(f):
        # 1x1 conv per level: forces conv-output layouts like the real FPN
        return {
            lvl: jax.lax.conv_general_dilated(
                v[None], kernels[lvl], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0]
            for lvl, v in f.items()
        }

    def timed(fn, *a, iters=10):
        for _ in range(3):
            np.asarray(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(*a))
        return (time.perf_counter() - t0) / iters

    # chain of 8 aligns inside one program to amortize dispatch; features
    # VARY per iteration so any relayout/reshape before the align cannot be
    # hoisted out of the scan (matching the real model, where features are
    # produced fresh per tile)
    def chain(align, with_conv):
        def prog(f, b):
            def body(acc, k):
                fk = {l: v + k.astype(v.dtype) for l, v in f.items()}
                ff = convd(fk) if with_conv else fk
                return acc + align(ff, b + k).sum(), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(8, dtype=jnp.float32)
            )
            return acc
        return jax.jit(prog)

    conv_only = jax.jit(lambda f: sum(v.sum() for v in convd(f).values()))
    t_conv = timed(conv_only, feats)
    print(f"conv-only: {t_conv * 1e3:.3f} ms")

    for name, align in (
        ("xla", lambda f, b: multilevel_roi_align(f, b, 7, adaptive_ratio=True)),
        ("pallas", lambda f, b: roi_align_pallas(f, b, 7, adaptive_ratio=True)),
    ):
        t_direct = timed(chain(align, False), feats, boxes)
        t_convd = timed(chain(align, True), feats, boxes)
        print(
            f"{name}: direct={t_direct / 8 * 1e3:.3f} ms/call  "
            f"conv-produced={(t_convd - t_conv) / 8 * 1e3:.3f} ms/call"
        )


if __name__ == "__main__":
    main()
