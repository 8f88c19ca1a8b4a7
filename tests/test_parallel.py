"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: tile-sharded
inference equals single-device inference; mesh helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.parallel.mesh import (
    pad_to_shards,
    partition_devices,
    tile_mesh,
)


def test_pad_to_shards():
    assert pad_to_shards(5, 4) == 8
    assert pad_to_shards(8, 4) == 8
    assert pad_to_shards(1, 8) == 8


def test_partition_devices_contiguous():
    devs = list(range(8))
    assert partition_devices(devs, 2) == [[0, 1, 2, 3], [4, 5, 6, 7]]
    assert partition_devices(devs, 3) == [[0, 1, 2], [3, 4, 5], [6, 7]]
    assert partition_devices(devs, 1) == [devs]
    # more groups than devices: one device per group, never empty
    assert partition_devices(devs[:2], 5) == [[0], [1]]


def test_member_meshes_gating():
    from deepemia_tpu.inference.pipeline import InferencePipeline

    mm = InferencePipeline._member_meshes
    mesh = tile_mesh()
    # disabled / single member / no mesh -> shared
    assert mm(None, 2, True) == [None, None]
    assert mm(mesh, 1, True) == [mesh]
    assert mm(mesh, 2, False) == [mesh, mesh]
    # enabled: two DISJOINT contiguous 4-device sub-meshes
    subs = mm(mesh, 2, True)
    assert [m.devices.size for m in subs] == [4, 4]
    all_devs = [d for m in subs for d in m.devices.flat]
    assert all_devs == list(mesh.devices.flat)


@pytest.mark.slow
def test_tile_sharded_engine_matches_single_device():
    from deepemia_tpu.inference.engine import (
        ClassSettings,
        TileEngine,
    )
    from deepemia_tpu.models.mask_rcnn import build_model, init_params

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    model = build_model("R50", num_classes=2, use_bf16=False)
    params = init_params(model, (64, 64), seed=5)
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(0)
    img = (rng.random((200, 300, 3)) * 255).astype(np.float32)

    kw = dict(tile_size=128, overlap_ratio=0.2, upscale_factor=1.0,
              capacity=64)
    single = TileEngine(model, params, **kw)
    sharded = TileEngine(model, params, mesh=tile_mesh(), **kw)

    inst_s, q_s = single.infer(img, settings)
    inst_m, q_m = sharded.infer(img, settings)
    assert q_s == pytest.approx(q_m)
    # identical detection sets (order may differ only among equal scores)
    vs = np.asarray(inst_s.valid)
    vm = np.asarray(inst_m.valid)
    assert vs.sum() == vm.sum()
    ss = np.sort(np.asarray(inst_s.scores)[vs])
    sm = np.sort(np.asarray(inst_m.scores)[vm])
    np.testing.assert_allclose(ss, sm, atol=1e-4)
    bs = np.asarray(inst_s.boxes)[vs]
    bm = np.asarray(inst_m.boxes)[vm]
    # sub-0.1px tolerance: the sharded path runs the backbone at a smaller
    # tile-batch per shard, and conv reduction order shifts box coords by
    # ~1e-4 relative — the detection SET must still be identical
    np.testing.assert_allclose(
        np.sort(bs, axis=0), np.sort(bm, axis=0), atol=0.1
    )


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(tiny_r50):
    """Same batch + rng through the train step on a 1-device mesh and a
    4x2 (data x model) mesh must produce identical losses — the sharding
    must not change the math."""
    import numpy as np

    from deepemia_tpu.train.trainer import (
        TrainState,
        build_train_step,
        make_mesh,
        make_optimizer,
        state_shardings,
    )

    model, _params = tiny_r50
    # host copy: the train step donates its state, deleting device buffers
    params_host = jax.device_get(_params)
    caps = dict(pre_nms_topk=64, post_nms_topk=32, rpn_batch=32, roi_batch=32,
                mask_rois=8)
    b, s, g = 4, 64, 2
    rng = np.random.default_rng(3)
    masks = np.zeros((b, g, s, s), bool)
    boxes = np.zeros((b, g, 4), np.float32)
    for i in range(b):
        y, x = rng.integers(8, 30, 2)
        masks[i, 0, y:y + 16, x:x + 16] = True
        boxes[i, 0] = [x, y, x + 16, y + 16]
    batch_np = {
        "image": (rng.random((b, s, s, 3)) * 255).astype(np.float32),
        "gt_boxes": boxes,
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_valid": np.concatenate(
            [np.ones((b, 1), bool), np.zeros((b, g - 1), bool)], axis=1),
        "gt_masks": masks,
    }
    key = jax.random.PRNGKey(9)

    losses = {}
    for name, mesh in (
        ("single", make_mesh(1, max_data=1)),
        ("sharded", make_mesh(2)),
    ):
        params = jax.tree.map(jnp.asarray, params_host)
        tx = make_optimizer(2.5e-4, 100, 10, params=params)
        state = TrainState.create(params, tx)
        step_fn, bsh = build_train_step(model, mesh, tx, caps, state_template=state)
        state = jax.device_put(state, state_shardings(state, mesh))
        batch = {k: jax.device_put(v, bsh[k]) for k, v in batch_np.items()}
        _, m = step_fn(state, batch, key)
        losses[name] = {k: float(v) for k, v in m.items()}

    for k in losses["single"]:
        assert losses["single"][k] == pytest.approx(
            losses["sharded"][k], rel=1e-4
        ), f"{k}: {losses['single'][k]} vs {losses['sharded'][k]}"


@pytest.mark.compiles
def test_split_serving_sharded_matches_single_device(tiny_r50):
    """The SHARDED split schedule (P1/P2 shard_mapped over a ('tile',)
    mesh) must yield the same detection set as the unsharded single-device
    engine — the multi-chip carry of the split-serving path."""
    from deepemia_tpu.inference.engine import ClassSettings, TileEngine

    assert len(jax.devices()) >= 8
    model, params = tiny_r50
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(4)
    img = (rng.random((200, 300, 3)) * 255).astype(np.float32)

    kw = dict(tile_size=128, overlap_ratio=0.2, upscale_factor=1.0,
              capacity=64, tile_batch=2)
    single = TileEngine(model, params, serving="split", **kw)
    sharded = TileEngine(
        model, params, mesh=tile_mesh(), serving="split", **kw
    )

    inst_s, q_s = single.infer(img, settings)
    inst_m, q_m = sharded.infer(img, settings)
    assert q_s == pytest.approx(q_m)
    vs = np.asarray(inst_s.valid)
    vm = np.asarray(inst_m.valid)
    assert vs.sum() == vm.sum()
    np.testing.assert_allclose(
        np.sort(np.asarray(inst_s.scores)[vs]),
        np.sort(np.asarray(inst_m.scores)[vm]),
        atol=1e-4,
    )
    # conv reduction order differs per shard batch; the jitter amplifies
    # through exp() in the box-delta decode to a few tenths of a pixel on
    # 100+px boxes — the detection SET (count + scores above) is identical
    np.testing.assert_allclose(
        np.sort(np.asarray(inst_s.boxes)[vs], axis=0),
        np.sort(np.asarray(inst_m.boxes)[vm], axis=0),
        atol=0.5,
    )


@pytest.mark.slow
def test_member_parallel_ensemble_matches_shared_mesh(tiny_r50):
    """Ensemble members on DISJOINT 4-device sub-meshes (the member-parallel
    layout, VERDICT r3 weak #6) must produce the same merged detection set
    as both members sharing the full 8-device mesh — the sub-meshing and
    the cross-mesh re-homing in run_ensemble change scheduling only."""
    from deepemia_tpu.inference.engine import ClassSettings, TileEngine
    from deepemia_tpu.inference.ensemble import run_ensemble

    assert len(jax.devices()) >= 8
    model, params = tiny_r50
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(4)
    img = (rng.random((200, 300, 3)) * 255).astype(np.float32)
    hw = img.shape[:2]
    kw = dict(tile_size=128, overlap_ratio=0.2, upscale_factor=1.0,
              capacity=64, tile_batch=2)

    groups = partition_devices(jax.devices(), 2)
    disjoint = [
        ("A", TileEngine(model, params, mesh=tile_mesh(devices=g), **kw), 1.0)
        for g in groups
    ]
    shared_mesh = tile_mesh()
    shared = [
        ("A", TileEngine(model, params, mesh=shared_mesh, **kw), 1.0)
        for _ in range(2)
    ]

    inst_d, q_d = run_ensemble(disjoint, img, settings, hw, apply_weights=False)
    inst_s, q_s = run_ensemble(shared, img, settings, hw, apply_weights=False)
    assert float(q_d) == pytest.approx(float(q_s))
    vd = np.asarray(inst_d.valid)
    vs = np.asarray(inst_s.valid)
    assert vd.sum() == vs.sum()
    np.testing.assert_allclose(
        np.sort(np.asarray(inst_d.scores)[vd]),
        np.sort(np.asarray(inst_s.scores)[vs]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(inst_d.boxes)[vd], axis=0),
        np.sort(np.asarray(inst_s.boxes)[vs], axis=0),
        atol=0.5,
    )


@pytest.mark.compiles
def test_split_serving_cross_process_paths_single_process(
    tiny_r50, monkeypatch
):
    """Fast-lane coverage of the PROCESS-SPANNING replication branches
    (VERDICT r4 next #10): the TileEngine takes three extra steps on a
    multi-host mesh — staging committed params through host memory,
    converting a committed input array to numpy before the replicating
    device_put, and emitting replicated outputs. The 2-process test that
    drives them for real is contention-flaky on a 1-core host and lives in
    the slow lane (tests/test_distributed.py); here the same code paths
    execute in-process by patching jax.process_count, and the detection
    set must match the unsharded engine."""
    from deepemia_tpu.inference.engine import ClassSettings, TileEngine

    assert len(jax.devices()) >= 2
    model, params = tiny_r50
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(4)
    img_np = (rng.random((200, 300, 3)) * 255).astype(np.float32)

    kw = dict(tile_size=128, overlap_ratio=0.2, upscale_factor=1.0,
              capacity=64, tile_batch=2)
    single = TileEngine(model, params, serving="split", **kw)
    inst_s, q_s = single.infer(img_np, settings)

    # committed single-device inputs, as a checkpoint load would produce
    params_committed = jax.device_put(params, jax.devices()[0])
    img_committed = jax.device_put(img_np, jax.devices()[0])
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # full 8-device tile mesh: identical program shapes to
    # test_split_serving_sharded_matches_single_device, so this test adds
    # no new compiles to the fast lane
    sharded = TileEngine(
        model, params_committed, mesh=tile_mesh(), serving="split", **kw
    )
    inst_m, q_m = sharded.infer(img_committed, settings)

    assert float(q_s) == pytest.approx(float(q_m))
    vs = np.asarray(inst_s.valid)
    vm = np.asarray(inst_m.valid)
    assert vs.sum() == vm.sum()
    np.testing.assert_allclose(
        np.sort(np.asarray(inst_s.scores)[vs]),
        np.sort(np.asarray(inst_m.scores)[vm]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(inst_s.boxes)[vs], axis=0),
        np.sort(np.asarray(inst_m.boxes)[vm], axis=0),
        atol=0.5,
    )
    # the merged outputs must be REPLICATED (host-readable on every
    # process of a real pod): fully-replicated arrays have one shard per
    # device covering the whole array
    assert inst_m.scores.sharding.is_fully_replicated
