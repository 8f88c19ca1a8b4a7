"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: tile-sharded
inference equals single-device inference; mesh helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.parallel.mesh import pad_to_shards, tile_mesh


def test_pad_to_shards():
    assert pad_to_shards(5, 4) == 8
    assert pad_to_shards(8, 4) == 8
    assert pad_to_shards(1, 8) == 8


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
    np.testing.assert_allclose(
        np.sort(bs, axis=0), np.sort(bm, axis=0), atol=1e-2
    )
