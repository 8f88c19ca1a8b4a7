"""Device-trace attribution of the split-serving P2 heads program.

The 4k profile (tools/profile_split_4k.py) shows P1 features ~0.62 s and
P2 heads ~0.55 s for 81 upscaled tiles — P2 costs nearly as much as the
backbone. This tool traces ONE P2 dispatch (proposal selection + Pallas
RoIAlign + box/mask heads + per-class NMS) at the production tile shape
and dumps framework_op_stats, so the next optimization targets the right
line (NMS fixpoint? top_k? head matmuls? the kernel itself?).

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profile_split_heads.py [tile=1024] [batch=16]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache(
    env_var="DEEPEMIA_TPU_BENCH_XLA_CACHE",
    default_base=os.path.join(
        os.path.expanduser("~"), ".cache", "deepemia_tpu_bench_xla"
    ),
)


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax.numpy as jnp

    from deepemia_tpu.inference.engine import TileEngine
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    model = build_model("R50", num_classes=2, use_bf16=True)
    params = init_params(model, (tile, tile), seed=0)
    eng = TileEngine(model, params, tile_size=tile, tile_batch=batch)
    feats_fn, heads_fn = eng.tile_forward_programs(tile, tile)
    p1 = jax.jit(feats_fn)
    p2 = jax.jit(heads_fn)

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        (rng.random((batch, tile, tile, 3)) * 255).astype(np.float32)
    )
    feats, logits, regs = p1(params, tiles)
    inst = p2(params, feats, logits, regs)
    np.asarray(inst.scores[..., 0])  # real barrier on axon

    reps = 10
    for name, fn, args in (
        ("P1 feats", p1, (params, tiles)),
        ("P2 heads", p2, (params, feats, logits, regs)),
    ):
        out = fn(*args)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt * 1e3:7.2f} ms / {batch} tiles = "
              f"{batch / dt:6.1f} tiles/s")

    trace_dir = "/tmp/jaxtrace_splitheads"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            inst = p2(params, feats, logits, regs)
        np.asarray(inst.scores[..., 0])

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane captured")
        return
    # the image's protobuf rejects the plugin's generated descriptors
    # under the C++ backend; pure-python parsing is slow but works
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [sorted(paths)[-1]], "framework_op_stats", {}
    )
    out = "/tmp/opstats_splitheads.csv"
    with open(out, "wb" if isinstance(data, bytes) else "w") as f:
        f.write(data)
    print("wrote", out)


if __name__ == "__main__":
    main()
