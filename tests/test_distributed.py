"""Multi-process (DCN) validation: a 2-process CPU cluster forms a
process-spanning mesh and runs one full Mask R-CNN train step whose losses
match a single-process run of the same batch (VERDICT r1 missing #5;
SURVEY.md §5 distributed-communication plan — ICI within a host via meshes,
DCN across hosts via jax.distributed).

The workers initialize through ``maybe_init_distributed`` (the production
entry point, driven by JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
JAX_PROCESS_ID) with 2 virtual CPU devices each -> a 4-device global mesh.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["DEEPEMIA_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from deepemia_tpu.utils.device import maybe_init_distributed

assert maybe_init_distributed(), "distributed init failed"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 local x 2 processes

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from deepemia_tpu.models.mask_rcnn import build_model, init_params
from deepemia_tpu.train.trainer import (
    TrainState, build_train_step, make_optimizer, state_shardings,
)
from jax.sharding import Mesh

model = build_model("R50", num_classes=2, use_bf16=False)
params = init_params(model, (64, 64), seed=0)
caps = dict(pre_nms_topk=64, post_nms_topk=32, rpn_batch=32, roi_batch=32,
            mask_rois=8)
# process-spanning mesh over all 4 global devices: data axis crosses the
# process boundary, so gradient psums ride the (emulated) DCN
mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "model"))
tx = make_optimizer(2.5e-4, 100, 10, params=params)
state = TrainState.create(params, tx)
step_fn, bsh = build_train_step(model, mesh, tx, caps, state_template=state)
state = jax.device_put(state, state_shardings(state, mesh))

b, s, g = 4, 64, 2
rng = np.random.default_rng(3)
masks = np.zeros((b, g, s, s), bool)
boxes = np.zeros((b, g, 4), np.float32)
for i in range(b):
    y, x = rng.integers(8, 30, 2)
    masks[i, 0, y:y+16, x:x+16] = True
    boxes[i, 0] = [x, y, x+16, y+16]
batch_np = {
    "image": (rng.random((b, s, s, 3)) * 255).astype(np.float32),
    "gt_boxes": boxes,
    "gt_classes": np.zeros((b, g), np.int32),
    "gt_valid": np.concatenate(
        [np.ones((b, 1), bool), np.zeros((b, g - 1), bool)], axis=1),
    "gt_masks": masks,
}
# every process holds the full host batch; make_array_from_callback places
# each process's shards from the global array
batch = {
    k: jax.make_array_from_callback(
        v.shape, bsh[k], lambda idx, v=v: v[idx]
    )
    for k, v in batch_np.items()
}
state, metrics = step_fn(state, batch, jax.random.PRNGKey(9))
out = {k: float(v) for k, v in metrics.items()}
if jax.process_index() == 0:
    with open(os.environ["DEEPEMIA_OUT"], "w") as f:
        json.dump(out, f)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    out_file = tmp_path / "metrics.json"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            DEEPEMIA_REPO=str(REPO),
            DEEPEMIA_OUT=str(out_file),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert out_file.exists(), "process 0 wrote no metrics"
    dist = json.loads(out_file.read_text())

    # single-process reference: same batch/seed on a local 4x1 mesh
    import jax
    import numpy as np

    from deepemia_tpu.models.mask_rcnn import build_model, init_params
    from deepemia_tpu.train.trainer import (
        TrainState,
        build_train_step,
        make_optimizer,
        state_shardings,
    )
    from jax.sharding import Mesh

    model = build_model("R50", num_classes=2, use_bf16=False)
    params = init_params(model, (64, 64), seed=0)
    caps = dict(
        pre_nms_topk=64, post_nms_topk=32, rpn_batch=32, roi_batch=32,
        mask_rois=8,
    )
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "model"))
    tx = make_optimizer(2.5e-4, 100, 10, params=params)
    state = TrainState.create(params, tx)
    step_fn, bsh = build_train_step(model, mesh, tx, caps, state_template=state)
    state = jax.device_put(state, state_shardings(state, mesh))

    b, s, g = 4, 64, 2
    rng = np.random.default_rng(3)
    masks = np.zeros((b, g, s, s), bool)
    boxes = np.zeros((b, g, 4), np.float32)
    for i in range(b):
        y, x = rng.integers(8, 30, 2)
        masks[i, 0, y : y + 16, x : x + 16] = True
        boxes[i, 0] = [x, y, x + 16, y + 16]
    batch_np = {
        "image": (rng.random((b, s, s, 3)) * 255).astype(np.float32),
        "gt_boxes": boxes,
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_valid": np.concatenate(
            [np.ones((b, 1), bool), np.zeros((b, g - 1), bool)], axis=1
        ),
        "gt_masks": masks,
    }
    batch = {k: jax.device_put(v, bsh[k]) for k, v in batch_np.items()}
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(9))
    ref = {k: float(v) for k, v in metrics.items()}

    for k, v in ref.items():
        assert dist[k] == pytest.approx(v, rel=1e-4), (
            f"{k}: dist {dist[k]} vs single {v}"
        )


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


INFER_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["DEEPEMIA_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from deepemia_tpu.utils.device import maybe_init_distributed
from deepemia_tpu.utils.xla_cache import setup_compilation_cache

setup_compilation_cache()
assert maybe_init_distributed(), "distributed init failed"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

import numpy as np
import jax.numpy as jnp

from deepemia_tpu.inference.engine import ClassSettings, TileEngine
from deepemia_tpu.models.mask_rcnn import build_model, init_params
from deepemia_tpu.parallel.mesh import tile_mesh

model = build_model("R50", num_classes=2, use_bf16=False)
params = init_params(model, (64, 64), seed=0)
settings = ClassSettings(
    confidence=jnp.asarray([0.05, 0.05]),
    nms_iou=jnp.asarray([0.5, 0.5]),
    min_size=jnp.zeros((2,)),
)
rng = np.random.default_rng(4)
img = (rng.random((200, 300, 3)) * 255).astype(np.float32)

# tile mesh over all 4 GLOBAL devices: the tile axis of P1 (conv program)
# and P2 (heads program) crosses the process boundary -- the actual pod
# inference topology (pipeline._choose_inference_mesh builds exactly this)
eng = TileEngine(
    model, params, mesh=tile_mesh(), serving="split",
    tile_size=128, overlap_ratio=0.2, upscale_factor=1.0,
    capacity=64, tile_batch=2,
)
inst, q = eng.infer(img, settings)
v = np.asarray(inst.valid)
out = {
    "quality": float(q),
    "count": int(v.sum()),
    "scores": sorted(float(s) for s in np.asarray(inst.scores)[v]),
    "boxes": np.sort(np.asarray(inst.boxes)[v], axis=0).tolist(),
}
if jax.process_index() == 0:
    with open(os.environ["DEEPEMIA_OUT"], "w") as f:
        json.dump(out, f)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_split_serving_matches_single_device(tmp_path, tiny_r50):
    """Split serving over a PROCESS-SPANNING ('tile',) mesh (2 procs x 2
    virtual CPU devices) must produce the same detection set as the
    unsharded single-device engine on the same image — the pod inference
    topology end-to-end (VERDICT r3 weak #7)."""
    import jax
    import jax.numpy as jnp

    port = _free_port()
    out_file = tmp_path / "inst.json"
    script = tmp_path / "infer_worker.py"
    script.write_text(INFER_WORKER)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            DEEPEMIA_REPO=str(REPO),
            DEEPEMIA_OUT=str(out_file),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert out_file.exists(), "process 0 wrote no result"
    dist = json.loads(out_file.read_text())

    # single-process single-device reference (same model: tiny_r50 is the
    # same (R50, 2-class, f32, seed-0 @ 64x64) build the worker makes)
    from deepemia_tpu.inference.engine import ClassSettings, TileEngine

    model, params = tiny_r50
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(4)
    img = (rng.random((200, 300, 3)) * 255).astype(np.float32)
    single = TileEngine(
        model, params, serving="split",
        tile_size=128, overlap_ratio=0.2, upscale_factor=1.0,
        capacity=64, tile_batch=2,
    )
    inst, q = single.infer(img, settings)
    v = np.asarray(inst.valid)

    assert dist["quality"] == pytest.approx(float(q), rel=1e-5)
    assert dist["count"] == int(v.sum())
    np.testing.assert_allclose(
        np.asarray(dist["scores"]),
        np.sort(np.asarray(inst.scores)[v]),
        atol=1e-4,
    )
    # same tolerance rationale as test_parallel: per-shard conv batch
    # reduction order amplifies through the box-delta exp() to tenths of
    # a pixel; the detection SET (count + scores) must match exactly
    np.testing.assert_allclose(
        np.asarray(dist["boxes"]),
        np.sort(np.asarray(inst.boxes)[v], axis=0),
        atol=0.5,
    )
