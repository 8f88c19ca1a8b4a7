"""Stage attribution for BASELINE config 4 (multiscale + iterative +
constraints on one 1024^2 image).

Hypothesis under test: the 4-scale ladder serializes on engine.infer's
``float(quality)`` host sync (one full tunnel round trip per scale), and the
eager dedup/constraint glue dispatches dozens of small ops instead of one
program.
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

from deepemia_tpu.inference.constraints import (
    apply_spatial_constraints,
    spec_from_config,
)
from deepemia_tpu.inference.engine import ClassSettings, TileEngine
from deepemia_tpu.inference.multiscale import (
    iterative_threshold_inference,
    run_multiscale_inference,
)
from deepemia_tpu.models.mask_rcnn import build_model, init_params

TILE = 1024


def sync(x):
    np.asarray(x)


def main():
    platform = jax.devices()[0].platform
    model = build_model("R50", num_classes=2, use_bf16=platform != "cpu")
    params = init_params(model, (TILE, TILE), seed=0)
    engine = TileEngine(model, params, use_tiling=False)
    settings = ClassSettings(
        confidence=jnp.asarray([0.2, 0.2]),
        nms_iou=jnp.asarray([0.7, 0.5]),
        min_size=jnp.asarray([25.0, 3.0]),
    )
    spec = spec_from_config(
        {
            "enabled": True,
            "containment_threshold": 0.95,
            "overlap_rules": {
                "class_0": {"allow_overlap": False, "max_iou_threshold": 0.3}
            },
            "containment_rules": {"class_1": 0},
        },
        num_classes=2,
    )
    rng = np.random.default_rng(0)
    img = jax.device_put((rng.random((TILE, TILE, 3)) * 255).astype(np.float32))
    base_thr = np.asarray([0.5, 0.3], np.float32)

    def staged():
        t = {}
        t0 = time.perf_counter()
        inst, _ = run_multiscale_inference(
            engine, img, settings, scales=(0.7, 1.0, 1.5, 2.0)
        )
        sync(inst.scores)
        t["multiscale"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        inst, _ = iterative_threshold_inference(inst, base_threshold=base_thr)
        sync(inst.valid)
        t["iterative"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        inst = apply_spatial_constraints(inst, (TILE, TILE), spec)
        sync(inst.valid)
        t["constraints"] = time.perf_counter() - t0
        return t

    staged()  # warmup/compile
    for _ in range(2):
        t = staged()
        total = sum(t.values())
        print(
            "  ".join(f"{k}={v * 1e3:.0f}ms" for k, v in t.items()),
            f" total={total * 1e3:.0f}ms",
        )

    # per-scale attribution inside the multiscale ladder
    from deepemia_tpu.inference import multiscale as ms

    for s in (0.7, 1.0, 1.5, 2.0):
        nh = max(64, int(round(TILE * s / 64)) * 64)
        resized = ms._device_resize(img, nh, nh)
        inst, q = engine.infer(resized, settings)
        t0 = time.perf_counter()
        for _ in range(3):
            inst, q = engine.infer(resized, settings)
        sync(inst.scores)
        print(f"scale {s}: infer+floatsync = {(time.perf_counter() - t0) / 3 * 1e3:.0f}ms")


if __name__ == "__main__":
    main()
