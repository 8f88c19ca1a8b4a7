"""Full training-loop integration test (slow): train -> checkpoint ->
resume -> reload through model IO."""

import json
from pathlib import Path

import cv2
import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_train_checkpoint_resume(tmp_path):
    from deepemia_tpu.data.models import load_model
    from deepemia_tpu.train.trainer import TrainConfig, train

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(4):
        im = np.full((96, 96, 3), 40, np.uint8)
        annos = []
        for j in range(2):
            cx, cy, r = (
                int(rng.integers(20, 76)),
                int(rng.integers(20, 76)),
                int(rng.integers(8, 13)),
            )
            cv2.circle(im, (cx, cy), r, (210, 210, 210), -1)
            t = np.linspace(0, 2 * np.pi, 16, endpoint=False)
            poly = []
            for a in t:
                poly.extend([float(cx + r * np.cos(a)), float(cy + r * np.sin(a))])
            annos.append(
                {
                    "bbox": [cx - r, cy - r, cx + r, cy + r],
                    "bbox_mode": "XYXY_ABS",
                    "segmentation": [poly],
                    "category_id": j % 2,
                }
            )
        p = imgs / f"im{i}.png"
        cv2.imwrite(str(p), im)
        records.append(
            {
                "file_name": str(p),
                "image_id": i,
                "height": 96,
                "width": 96,
                "annotations": annos,
            }
        )

    cfg = TrainConfig(
        backbone="R50",
        ims_per_batch=2,
        train_size=128,
        max_instances=8,
        augment=True,
        checkpoint_every=2,
        log_every=10,
        use_bf16=False,
        warmup_iters=2,
        loss_caps=dict(
            pre_nms_topk=128,
            post_nms_topk=64,
            rpn_batch=64,
            roi_batch=64,
            mask_rois=16,
        ),
    )
    out = tmp_path / "out"
    ckpt, metrics = train(
        records, num_classes=2, output_dir=str(out), cfg=cfg, max_steps_override=2
    )
    assert np.isfinite(metrics["total"])
    assert Path(ckpt).exists()

    # resume from step 2, run to 3 (proves the manager restored)
    ckpt2, m2 = train(
        records, num_classes=2, output_dir=str(out), cfg=cfg, max_steps_override=3
    )
    assert np.isfinite(m2["total"])

    model, params = load_model(ckpt2, num_classes=2, use_bf16=False)
    assert model.depth == 50
    n = sum(x.size for x in jax.tree.leaves(params))
    assert n > 40e6


@pytest.mark.compiles
def test_packed_mask_transfer_equivalence(tiny_r50):
    """The loader's bit-packed GT-mask transfer format (uint8, W//8) yields
    the same loss as raw bool masks: unpack_mask_bits inverts np.packbits
    exactly, and build_train_step accepts either dtype (the padded bool
    tensor was ~94% of the measured step wall time over the device link —
    tools/profile_train_step.py)."""
    import jax.numpy as jnp

    from deepemia_tpu.train.trainer import (
        TrainState,
        build_train_step,
        make_mesh,
        make_optimizer,
        state_shardings,
        unpack_mask_bits,
    )

    rng = np.random.default_rng(7)
    m = rng.random((3, 64, 64)) > 0.6
    packed = np.packbits(m, axis=-1)
    assert packed.shape == (3, 64, 8)
    assert np.array_equal(np.asarray(unpack_mask_bits(jnp.asarray(packed))), m)

    model, params = tiny_r50
    tx = make_optimizer(1e-3, 10, params=params)
    caps = dict(
        pre_nms_topk=64, post_nms_topk=32, rpn_batch=32, roi_batch=32,
        mask_rois=8,
    )
    losses = []
    for masks in (
        m[None].copy(),  # [B=1, G=3, 64, 64] bool
        packed[None].copy(),  # packed transfer format
    ):
        # the step donates its state; copy so the session fixture's params
        # (aliased by a same-sharding device_put) are never deleted
        own_params = jax.tree.map(lambda x: x.copy(), params)
        state = TrainState.create(own_params, tx)
        mesh = make_mesh(1, max_data=1)
        step_fn, bsh = build_train_step(
            model, mesh, tx, loss_caps=caps, state_template=state
        )
        state = jax.device_put(state, state_shardings(state, mesh))
        batch = {
            "image": (rng.random((1, 64, 64, 3)) * 0 + 128).astype(np.uint8),
            "gt_boxes": np.array(
                [[[4, 4, 30, 30], [30, 30, 60, 60], [10, 40, 28, 58]]],
                np.float32,
            ),
            "gt_classes": np.zeros((1, 3), np.int32),
            "gt_valid": np.ones((1, 3), bool),
            "gt_masks": masks,
        }
        batch = {k: jax.device_put(v, bsh[k]) for k, v in batch.items()}
        _, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses[0])
    assert abs(losses[0] - losses[1]) < 1e-5


@pytest.mark.compiles
def test_packed_wire_step_equivalence(tiny_r50):
    """The single-buffer wire format (pack_batch_bytes -> one device_put ->
    device-side bitcast unpack) yields EXACTLY the dict-path loss: the
    trainer loop ships batch + PRNG key as one [B,L] uint8 row per example
    (six per-step transfers each paid a full round trip on a tunneled
    device)."""
    import jax.numpy as jnp

    from deepemia_tpu.train.trainer import (
        TrainState,
        build_train_step,
        make_mesh,
        make_optimizer,
        pack_batch_bytes,
        state_shardings,
        unpack_batch_bytes,
    )

    model, params = tiny_r50
    tx = make_optimizer(1e-3, 10, params=params)
    caps = dict(
        pre_nms_topk=64, post_nms_topk=32, rpn_batch=32, roi_batch=32,
        mask_rois=8,
    )
    rng = np.random.default_rng(3)
    masks = rng.random((2, 4, 64, 64)) > 0.7
    batch = {
        "image": (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8),
        "gt_boxes": rng.random((2, 4, 4)).astype(np.float32) * 40,
        "gt_classes": np.ones((2, 4), np.int32),
        "gt_valid": np.ones((2, 4), bool),
        "gt_masks": np.packbits(masks, axis=-1),
    }
    key_data = np.array([7, 42], np.uint32)

    buf = pack_batch_bytes(batch, key_data)
    # round trip on host semantics first
    ub, uk = unpack_batch_bytes(jnp.asarray(buf), 64, 4)
    assert np.array_equal(np.asarray(uk), key_data)
    for k in batch:
        assert np.array_equal(np.asarray(ub[k]), batch[k]), k

    losses = []
    for mode in ("dict", "packed"):
        own = jax.tree.map(lambda x: x.copy(), params)
        state = TrainState.create(own, tx)
        mesh = make_mesh(1, max_data=2)
        step_fn, bsh, packed_fn, packed_sh = build_train_step(
            model, mesh, tx, loss_caps=caps, state_template=state,
            packed_shape=(64, 4),
        )
        state = jax.device_put(state, state_shardings(state, mesh))
        if mode == "dict":
            db = {k: jax.device_put(v, bsh[k]) for k, v in batch.items()}
            _, metrics = step_fn(state, db, jnp.asarray(key_data))
        else:
            _, metrics = packed_fn(
                state, jax.device_put(buf, packed_sh)
            )
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1]


@pytest.mark.compiles
def test_chunked_dispatch_equivalence(tiny_r50):
    """steps_per_dispatch: one lax.scan over K packed batches must produce
    the same training trajectory as K single-step dispatches — same batch
    and key streams, same step counts; only the dispatch granularity
    changes (the trainer uses chunks to amortize the per-step host round
    trip on tunneled devices; chunks never cross checkpoint boundaries).
    Tolerances are tight-but-nonzero: XLA fuses the scan body differently
    than the standalone step program, so f32 results differ by a few ULPs
    per step."""
    import jax.numpy as jnp

    from deepemia_tpu.train.trainer import (
        TrainState,
        build_train_step,
        make_mesh,
        make_optimizer,
        pack_batch_bytes,
        state_shardings,
    )

    model, params = tiny_r50
    tx = make_optimizer(1e-3, 10, params=params)
    caps = dict(
        pre_nms_topk=64, post_nms_topk=32, rpn_batch=32, roi_batch=32,
        mask_rois=8,
    )
    rng = np.random.default_rng(11)
    K = 3
    bufs = []
    for j in range(K):
        masks = rng.random((2, 4, 64, 64)) > 0.7
        batch = {
            "image": (rng.random((2, 64, 64, 3)) * 255).astype(np.uint8),
            "gt_boxes": rng.random((2, 4, 4)).astype(np.float32) * 40,
            "gt_classes": np.ones((2, 4), np.int32),
            "gt_valid": np.ones((2, 4), bool),
            "gt_masks": np.packbits(masks, axis=-1),
        }
        bufs.append(pack_batch_bytes(batch, np.array([7, j], np.uint32)))

    finals, metric_streams = [], []
    for mode in ("single", "chunk"):
        own = jax.tree.map(lambda x: x.copy(), params)
        state = TrainState.create(own, tx)
        mesh = make_mesh(1, max_data=2)
        _, _, packed_fn, packed_sh, chunk_fn, chunk_sh = build_train_step(
            model, mesh, tx, loss_caps=caps, state_template=state,
            packed_shape=(64, 4), with_chunks=True,
        )
        state = jax.device_put(state, state_shardings(state, mesh))
        if mode == "single":
            ms = []
            for buf in bufs:
                state, m = packed_fn(state, jax.device_put(buf, packed_sh))
                ms.append(float(m["total"]))
        else:
            state, m = chunk_fn(
                state, jax.device_put(np.stack(bufs), chunk_sh)
            )
            ms = [float(v) for v in np.asarray(m["total"])]
        assert int(state.step) == K
        finals.append(jax.device_get(state.params))
        metric_streams.append(ms)

    assert all(np.isfinite(metric_streams[0]))
    np.testing.assert_allclose(
        metric_streams[0], metric_streams[1], rtol=1e-5
    )
    flat_a = jax.tree_util.tree_leaves_with_path(finals[0])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(finals[1]))
    for path, va in flat_a:
        vb = np.asarray(flat_b[path], np.float32)
        np.testing.assert_allclose(
            np.asarray(va, np.float32), vb, rtol=1e-3, atol=1e-5,
            err_msg=str(path),
        )


def test_dispatch_chunk_boundaries():
    """Chunks must tile [start, max_iter) exactly, never cross a checkpoint
    boundary, and reach every checkpoint step a single-step loop would."""
    from deepemia_tpu.train.trainer import dispatch_chunk_end

    for k, max_iter, every, start in [
        (8, 100, 20, 0),    # aligned
        (8, 100, 10, 0),    # chunk == boundary spacing fraction
        (8, 103, 20, 0),    # ragged tail
        (8, 100, 5, 0),     # boundaries tighter than k
        (3, 17, 7, 0),      # nothing divides anything
        (8, 100, 20, 13),   # resume from an unaligned step
        (1, 9, 4, 0),       # k=1 degenerates to single-step
    ]:
        i, ends = start, []
        while i < max_iter:
            e = dispatch_chunk_end(i, k, max_iter, every)
            assert i < e <= max_iter
            assert e - i <= k
            # never crosses a checkpoint boundary
            assert (i // every) == ((e - 1) // every)
            ends.append(e)
            i = e
        assert ends[-1] == max_iter
        # every checkpoint multiple in (start, max_iter] is an end
        ckpts = {s for s in range(start + 1, max_iter + 1) if s % every == 0}
        assert ckpts <= set(ends)
