"""Tests for iterative/multiscale modes, morphology postproc, size heuristics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.inference.detections import empty_instances
from deepemia_tpu.inference.multiscale import (
    determine_small_classes,
    iterative_threshold_inference,
)
from deepemia_tpu.inference.postprocess import (
    morphology_postprocess,
    reject_fragmented_masks,
)
from deepemia_tpu.ops.masks import paste_masks


def _inst_with_scores(scores, cap=16):
    inst = empty_instances(cap)
    n = len(scores)
    return inst._replace(
        scores=inst.scores.at[:n].set(jnp.asarray(scores, jnp.float32)),
        valid=inst.valid.at[:n].set(True),
        boxes=inst.boxes.at[:n].set(jnp.asarray([[0, 0, 10, 10]] * n)),
        mask_probs=inst.mask_probs.at[:n].set(1.0),
    )


def test_iterative_stops_on_small_relative_increase():
    # 12 instances at high scores, 1 extra at a low score: once count >= 10
    # and the next step adds <25%, iteration stops before reaching the floor
    scores = [0.9] * 12 + [0.25]
    inst = _inst_with_scores(scores)
    out, diag = iterative_threshold_inference(
        inst, base_threshold=0.8, floor_threshold=0.2, num_steps=4,
        min_total_masks=10, min_relative_increase=0.25,
    )
    assert diag["final_threshold"][0] > 0.25
    assert int(out.valid.sum()) == 12  # the 0.25 instance never admitted


def test_iterative_runs_to_floor_when_scarce():
    scores = [0.9, 0.85, 0.5, 0.3, 0.22]
    inst = _inst_with_scores(scores)
    out, diag = iterative_threshold_inference(
        inst, base_threshold=0.8, floor_threshold=0.2, num_steps=4,
        min_total_masks=10, max_consecutive_zero=2,
    )
    assert diag["final_threshold"][0] == pytest.approx(0.2)
    assert int(out.valid.sum()) == 5


def test_determine_small_classes():
    sizes = {0: 1000.0, 1: 50.0, 2: 2000.0, 3: 30.0}
    small = determine_small_classes(sizes)
    assert small == {1, 3}
    assert determine_small_classes({}) == set()


def test_morphology_postprocess_fills_holes_and_gates_size():
    cap = 4
    inst = empty_instances(cap)
    # instance 0: 28x28 grid with a hole in the middle, box 40x40
    probs = np.ones((28, 28), np.float32)
    probs[12:16, 12:16] = 0.0
    inst = inst._replace(
        mask_probs=inst.mask_probs.at[0].set(jnp.asarray(probs)),
        boxes=inst.boxes.at[0].set(jnp.asarray([20.0, 20.0, 60.0, 60.0])),
        valid=inst.valid.at[0].set(True),
        # instance 1: tiny 2x2 box -> dropped by the large-class size gate
        # (min 25 px)
    )
    inst = inst._replace(
        mask_probs=inst.mask_probs.at[1].set(1.0),
        boxes=inst.boxes.at[1].set(jnp.asarray([0.0, 0.0, 3.0, 3.0])),
        valid=inst.valid.at[1].set(True),
    )
    out = morphology_postprocess(inst, (100, 100))
    valid = np.asarray(out.valid)
    assert valid[0] and not valid[1]
    # pasted result of instance 0 has the hole filled
    full = np.asarray(
        paste_masks(out.mask_probs[:1], out.boxes[:1], 100, 100)
    )[0]
    assert full[40, 40]  # center of the (former) hole region


def test_reject_fragmented_masks():
    cap = 2
    inst = empty_instances(cap)
    # two disjoint blobs inside one RoI grid
    probs = np.zeros((28, 28), np.float32)
    probs[2:10, 2:10] = 1.0
    probs[18:26, 18:26] = 1.0
    single = np.zeros((28, 28), np.float32)
    single[4:24, 4:24] = 1.0
    inst = inst._replace(
        mask_probs=jnp.asarray(np.stack([probs, single])),
        boxes=jnp.asarray([[0.0, 0.0, 56.0, 56.0]] * 2),
        valid=jnp.asarray([True, True]),
    )
    out = reject_fragmented_masks(inst, (64, 64))
    assert np.asarray(out.valid).tolist() == [False, True]


def test_choose_inference_mesh_auto_and_override():
    from deepemia_tpu.inference.pipeline import InferencePipeline

    choose = InferencePipeline._choose_inference_mesh
    mesh = choose({})  # auto: all 8 virtual devices
    assert mesh is not None and mesh.size == len(jax.devices())
    assert mesh.axis_names == ("tile",)
    assert choose({"inference_chips": 1}) is None
    mesh4 = choose({"inference_chips": 4})
    assert mesh4 is not None and mesh4.size == 4


def test_class_settings_small_class_defaults():
    from deepemia_tpu.inference.engine import class_settings_from_config

    inf = {
        "class_specific_settings": {
            "class_0": {"confidence_threshold": 0.9, "iou_threshold": 0.2}
        }
    }
    # class 0 explicit, classes 1 (small) and 2 (large) fall back to the
    # reference small/large defaults (inference.py:800-816)
    s = class_settings_from_config(inf, 3, small_classes={1})
    conf = np.asarray(s.confidence)
    nms = np.asarray(s.nms_iou)
    assert conf.tolist() == pytest.approx([0.9, 0.3, 0.5])
    assert nms.tolist() == pytest.approx([0.2, 0.5, 0.7])
    # without heuristic knowledge: legacy neutral defaults
    s2 = class_settings_from_config(inf, 3)
    assert np.asarray(s2.confidence).tolist() == pytest.approx([0.9, 0.5, 0.5])


def test_ensemble_secondary_class_filter():
    from deepemia_tpu.inference.ensemble import run_ensemble

    class FakeEngine:
        capacity = 8

        def __init__(self, classes):
            self._classes = classes

        def infer(self, image, settings, upscale=None):
            inst = empty_instances(8)
            n = len(self._classes)
            inst = inst._replace(
                boxes=inst.boxes.at[:n].set(
                    jnp.asarray(
                        [[10.0 * i, 10.0 * i, 10.0 * i + 5, 10.0 * i + 5]
                         for i in range(n)]
                    )
                ),
                scores=inst.scores.at[:n].set(0.9),
                classes=inst.classes.at[:n].set(
                    jnp.asarray(self._classes, jnp.int32)
                ),
                valid=inst.valid.at[:n].set(True),
                mask_probs=inst.mask_probs.at[:n].set(1.0),
            )
            return inst, 0.5

    engines = [
        ("R50", FakeEngine([0, 1]), 1.0),
        ("R101", FakeEngine([0, 1]), 1.0),  # boxes overlap member 1's
    ]
    # small_classes_only: member 2 may only contribute class 1; its class-0
    # duplicate is dropped BEFORE dedup, its class-1 duplicate by dedup
    inst, _ = run_ensemble(
        engines, None, None, (64, 64), apply_weights=False,
        secondary_class_filter={1},
    )
    valid = np.asarray(inst.valid)
    classes = np.asarray(inst.classes)[valid]
    assert sorted(classes.tolist()) == [0, 1]
    # no filter: dedup still collapses identical boxes
    inst2, _ = run_ensemble(
        engines, None, None, (64, 64), apply_weights=False,
        secondary_class_filter=None,
    )
    assert int(np.asarray(inst2.valid).sum()) == 2


def test_downscaled_full_pass_recovers_objects_larger_than_a_tile(tiny_r50):
    """Images beyond full_pass_max_dim run a DOWNSCALED full pass: an
    interior object larger than a tile cannot be recovered from tiles
    (every partial view is edge-filtered), so the scaled pass must supply
    it (reference inference.py:2341 always runs a full pass)."""
    from deepemia_tpu.inference.engine import ClassSettings, TileEngine
    from deepemia_tpu.ops import masks as mask_ops

    model, params = tiny_r50
    engine = TileEngine(
        model, params, tile_size=128, overlap_ratio=0.2, upscale_factor=1.0,
        capacity=64, full_pass_max_dim=256,
    )

    def fake_forward(params_, image):
        # deterministic detector: one instance = bbox of bright pixels
        from deepemia_tpu.inference.detections import empty_instances

        bright = image.astype(jnp.float32).sum(-1) > 300.0
        box = mask_ops.mask_bboxes(bright[None])[0]
        area = (box[2] - box[0]) * (box[3] - box[1])
        inst = empty_instances(8)
        return inst._replace(
            boxes=inst.boxes.at[0].set(box),
            scores=inst.scores.at[0].set(0.9),
            valid=inst.valid.at[0].set(area > 4.0),
            mask_probs=inst.mask_probs.at[0].set(1.0),
        )

    engine._forward = fake_forward
    engine._forward_tile_batch = lambda params_, tiles_up: jax.lax.map(
        lambda t: fake_forward(params_, t), tiles_up
    )
    img = np.zeros((640, 640, 3), np.float32)
    yy, xx = np.mgrid[:640, :640]
    disk = (yy - 320) ** 2 + (xx - 320) ** 2 <= 160**2  # diameter 320 > tile
    img[disk] = 200.0
    settings = ClassSettings(
        confidence=jnp.asarray([0.5, 0.5]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    inst, _ = engine.infer(img, settings)
    valid = np.asarray(inst.valid)
    boxes = np.asarray(inst.boxes)[valid]
    assert len(boxes) > 0, "no detections at all"
    true = np.array([160.0, 160.0, 480.0, 480.0])

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2]); rb = np.minimum(a[2:], b[2:])
        wh = np.clip(rb - lt, 0, None); inter = wh[0] * wh[1]
        ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
        return inter / ua

    best = max(iou(b, true) for b in boxes)
    assert best > 0.6, f"large object not recovered (best IoU {best:.2f})"


@pytest.mark.compiles
def test_split_serving_matches_fused(tiny_r50):
    """The multi-program split schedule (conv-pure features program +
    separate heads program) must produce the same instances as the fused
    single-program path — identical math, different program boundaries."""
    import jax.numpy as jnp
    import numpy as np

    from deepemia_tpu.inference.engine import ClassSettings, TileEngine

    model, params = tiny_r50
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(7)
    img = (rng.random((256, 256, 3)) * 255).astype(np.uint8)

    def run(serving):
        eng = TileEngine(
            model, params, tile_size=128, overlap_ratio=0.2,
            upscale_factor=1.0, capacity=64, full_pass_max_dim=512,
            tile_batch=2, serving=serving,
        )
        inst, quality = eng.infer(img, settings)
        return inst, quality

    inst_f, q_f = run("fused")
    inst_s, q_s = run("split")
    assert q_f == q_s
    vf, vs = np.asarray(inst_f.valid), np.asarray(inst_s.valid)
    np.testing.assert_array_equal(vf, vs)
    np.testing.assert_allclose(
        np.asarray(inst_f.boxes)[vf], np.asarray(inst_s.boxes)[vs],
        rtol=1e-4, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(inst_f.scores)[vf], np.asarray(inst_s.scores)[vs],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(inst_f.classes)[vf], np.asarray(inst_s.classes)[vs]
    )


@pytest.mark.compiles
def test_heads_vectorize_vmap_matches_map(tiny_r50):
    """heads_vectorize='vmap' (batched per-tile RPN/RoI heads: one FC
    matmul, batched top_k/NMS) must produce the same instances as the
    default sequential lax.map, through BOTH the fused and split serving
    paths — it exists purely as a TPU scheduling A/B
    (tools/bench_heads_vmap.py)."""
    import jax.numpy as jnp
    import numpy as np

    from deepemia_tpu.inference.engine import ClassSettings, TileEngine

    model, params = tiny_r50
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(11)
    img = (rng.random((256, 256, 3)) * 255).astype(np.uint8)

    def run(serving, hv):
        eng = TileEngine(
            model, params, tile_size=128, overlap_ratio=0.2,
            upscale_factor=1.0, capacity=64, full_pass_max_dim=512,
            tile_batch=2, serving=serving, heads_vectorize=hv,
        )
        return eng.infer(img, settings)

    for serving in ("fused", "split"):
        inst_m, q_m = run(serving, "map")
        inst_v, q_v = run(serving, "vmap")
        assert q_m == q_v
        vm, vv = np.asarray(inst_m.valid), np.asarray(inst_v.valid)
        np.testing.assert_array_equal(vm, vv, err_msg=serving)
        np.testing.assert_allclose(
            np.asarray(inst_m.boxes)[vm], np.asarray(inst_v.boxes)[vv],
            rtol=1e-4, atol=1e-3, err_msg=serving,
        )
        np.testing.assert_allclose(
            np.asarray(inst_m.scores)[vm], np.asarray(inst_v.scores)[vv],
            rtol=1e-4, atol=1e-4, err_msg=serving,
        )
        np.testing.assert_array_equal(
            np.asarray(inst_m.classes)[vm], np.asarray(inst_v.classes)[vv]
        )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        TileEngine(model, params, heads_vectorize="bogus")


def test_device_resize_matches_host_cv2():
    """The multiscale device resize (jax.image.resize, antialias=False) must
    reproduce the host path's cv2.resize(INTER_LINEAR) — with the default
    antialias=True, downscales produced different pixels (hence different
    detections) depending only on whether the caller passed a numpy or a
    jax array."""
    import cv2

    from deepemia_tpu.inference.multiscale import _device_resize

    rng = np.random.default_rng(0)
    img = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
    for nh, nw in [(128, 128), (192, 320), (512, 384)]:
        host = cv2.resize(
            img, (nw, nh), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32)
        dev = np.asarray(
            _device_resize(jnp.asarray(img.astype(np.float32)), nh, nw)
        )
        # cv2 rounds through uint8 + fixed-point interp: <1 gray level
        assert np.abs(host - dev).max() < 1.0, (nh, nw)


def test_classes_using_tiling_filters_tile_sources(tiny_r50):
    """tile_settings.classes_using_tiling: tile-SOURCED detections of
    unlisted classes are dropped in the merge while the full-image pass
    still supplies those classes. The reference parses this key but never
    enforces it (inference.py:548 vs :828 runs tiling "for all classes");
    here a configured list is honored."""
    from deepemia_tpu.inference.detections import InstanceSet
    from deepemia_tpu.inference.engine import TileEngine

    model, params = tiny_r50
    eng = TileEngine(
        model, params, edge_filter=False, classes_using_tiling=[0],
        capacity=16,
    )
    B, D = 2, 3
    inst = InstanceSet(
        boxes=jnp.tile(jnp.asarray([1.0, 1.0, 9.0, 9.0]), (B, D, 1)),
        scores=jnp.full((B, D), 0.9),
        classes=jnp.asarray([[0, 1, 0], [1, 1, 0]], jnp.int32),
        valid=jnp.ones((B, D), bool),
        mask_probs=jnp.ones((B, D, 4, 4)),
    )
    offs = jnp.zeros((B, 2))
    ok = jnp.ones((B,), bool)
    out = eng._finish_batch(inst, offs, ok, 64, 1.0, 128, 128)
    np.testing.assert_array_equal(
        np.asarray(out.valid),
        [[True, False, True], [False, False, True]],
    )
    # default (key absent -> None): every class keeps its tile detections
    eng2 = TileEngine(model, params, edge_filter=False, capacity=16)
    out2 = eng2._finish_batch(inst, offs, ok, 64, 1.0, 128, 128)
    assert np.asarray(out2.valid).all()


def test_classes_using_tiling_schema_default_none():
    """Absent key validates to None (= all classes tile); an explicit list
    passes through. The old default [0, 1] would silently un-tile class 2+
    on multi-class datasets, so it must NOT be inserted."""
    from deepemia_tpu.config.config import default_config
    from deepemia_tpu.config.schema import validate_config

    base = default_config()
    cfg = validate_config(base, create_dirs=False)
    assert (
        cfg["inference_settings"]["tile_settings"]["classes_using_tiling"]
        is None
    )
    base["inference_settings"]["tile_settings"]["classes_using_tiling"] = [0, 2]
    cfg = validate_config(base, create_dirs=False)
    assert (
        cfg["inference_settings"]["tile_settings"]["classes_using_tiling"]
        == [0, 2]
    )
