"""Trace the 4k tile-pipeline on the real chip and aggregate op categories."""

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.inference.engine import ClassSettings, TileEngine
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    model = build_model("R50", num_classes=2, use_bf16=True)
    params = init_params(model, (512, 512), seed=0)
    engine = TileEngine(model, params, tile_size=512, overlap_ratio=0.1,
                        upscale_factor=2.0)
    settings = ClassSettings(
        confidence=jnp.asarray([0.5, 0.3]),
        nms_iou=jnp.asarray([0.7, 0.5]),
        min_size=jnp.asarray([25.0, 3.0]),
    )
    rng = np.random.default_rng(0)
    img = (rng.random((4096, 4096, 3)) * 255).astype(np.uint8)
    inst, _ = engine.infer(img, settings)
    np.asarray(inst.scores)

    d = "/tmp/jaxtrace_4k"
    os.makedirs(d, exist_ok=True)
    with jax.profiler.trace(d):
        inst, _ = engine.infer(img, settings)
        np.asarray(inst.scores)

    path = sorted(glob.glob(f"{d}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    cat = collections.Counter()
    ops = collections.Counter()
    total = 0
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            nm = e["name"]
            if nm.startswith(("jit_", "jit(")) or nm.startswith("while"):
                if nm.startswith("jit"):
                    total += e["dur"]
                continue
            cat[e.get("args", {}).get("hlo_category", "?")] += e["dur"]
            ops[nm] += e["dur"]
    print(f"total jit time on device: {total / 1e3:.1f} ms")
    for c, v in cat.most_common(12):
        print(f"{v / 1e3:9.2f} ms  {c}")
    print("top ops:")
    for nm, v in ops.most_common(12):
        print(f"{v / 1e3:9.2f} ms  {nm[:80]}")


if __name__ == "__main__":
    main()
