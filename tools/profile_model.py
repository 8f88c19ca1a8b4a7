"""Capture a device trace of the model forward and dump per-op time stats."""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE = 1024


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    import jax
    import jax.numpy as jnp

    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    model = build_model("R50", num_classes=2, use_bf16=True, roi_backend=backend)
    params = init_params(model, (TILE, TILE), seed=0)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray((rng.random((2, TILE, TILE, 3)) * 255).astype(np.float32))
    fn = jax.jit(
        lambda p, ts: jax.lax.map(
            lambda t: model.apply(p, t, score_threshold=0.05), ts
        ).scores.sum()
    )
    for _ in range(2):
        np.asarray(fn(params, tiles))

    trace_dir = f"/tmp/jaxtrace_{backend}"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        np.asarray(fn(params, tiles))
        np.asarray(fn(params, tiles))

    # summarize the xplane: per-op self time
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane:", paths)
    # the image's protobuf rejects the plugin's generated descriptors
    # under the C++ backend; pure-python parsing is slow but works
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {}
    )
    out = f"/tmp/opstats_{backend}.csv"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print("wrote", out)


if __name__ == "__main__":
    main()
