"""Sustained-throughput + device-trace profile of the real train step.

Per-dispatch wall timing over the axon tunnel has a ~30 ms round-trip floor
that swamps sub-millisecond programs (tools/profile_train_loss.py), so this
tool measures the pipelined sustained rate of ``build_train_step`` (the
production pjit program) and dumps a framework-op-stats CSV from a device
trace for exact attribution.
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# share the bench harness's persistent compilation cache so repeat profiles
# skip the multi-minute train-step compile
from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache(
    env_var="DEEPEMIA_TPU_BENCH_XLA_CACHE",
    default_base=os.path.join(
        os.path.expanduser("~"), ".cache", "deepemia_tpu_bench_xla"
    ),
)


def sync(metrics):
    """On the axon remote platform block_until_ready returns before the
    device finishes; a device->host value pull is the only real barrier."""
    np.asarray(metrics["total"])


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    train_roi = sys.argv[3] if len(sys.argv) > 3 else "xla_fast_grad"
    gmax = 64

    from deepemia_tpu.models.mask_rcnn import build_model, init_params
    from deepemia_tpu.train.trainer import (
        TrainState,
        build_train_step,
        make_mesh,
        make_optimizer,
        state_shardings,
    )

    model = build_model(
        "R50", num_classes=2, use_bf16=True, train_roi_backend=train_roi
    )
    params = init_params(model, (size, size))
    tx = make_optimizer(0.00025, 1000, params=params)
    state = TrainState.create(params, tx)
    mesh = make_mesh(1, max_data=batch)
    step_fn, batch_shardings = build_train_step(
        model, mesh, tx, state_template=state
    )
    state = jax.device_put(state, state_shardings(state, mesh))

    rng = np.random.default_rng(0)
    host_batch = {
        "image": (rng.random((batch, size, size, 3)) * 255).astype(np.float32),
        "gt_boxes": np.tile(
            np.array([[10, 10, 80, 80]], np.float32), (batch, gmax, 1)
        ),
        "gt_classes": np.zeros((batch, gmax), np.int32),
        "gt_valid": np.tile(
            (np.arange(gmax) < 6)[None], (batch, 1)
        ),
        "gt_masks": rng.random((batch, gmax, size, size)) > 0.8,
    }
    dev_batch = {
        k: jax.device_put(v, batch_shardings[k]) for k, v in host_batch.items()
    }
    key = jax.random.PRNGKey(0)

    # warmup / compile
    for _ in range(3):
        state, m = step_fn(state, dev_batch, key)
    sync(m)

    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step_fn(state, dev_batch, key)
    sync(m)
    dt = (time.perf_counter() - t0) / n
    print(
        f"sustained (device-resident batch): {dt * 1e3:.1f} ms/step = "
        f"{1 / dt:.2f} steps/s = {batch / dt:.1f} img/s  (B={batch}, {size}^2)"
    )

    t0 = time.perf_counter()
    for _ in range(n):
        db = {
            k: jax.device_put(v, batch_shardings[k]) for k, v in host_batch.items()
        }
        state, m = step_fn(state, db, key)
    sync(m)
    dt2 = (time.perf_counter() - t0) / n
    print(
        f"sustained (per-step device_put):   {dt2 * 1e3:.1f} ms/step = "
        f"{1 / dt2:.2f} steps/s  (transfer overhead {1e3 * (dt2 - dt):.1f} ms)"
    )

    trace_dir = "/tmp/jaxtrace_trainstep"
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, m = step_fn(state, dev_batch, key)
        sync(m)

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
    out = "/tmp/opstats_trainstep.csv"
    with open(out, "wb" if isinstance(data, bytes) else "w") as f:
        f.write(data)
    print("wrote", out)


if __name__ == "__main__":
    main()
