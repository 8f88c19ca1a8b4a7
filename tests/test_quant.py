"""Int8 quantized backbone (models/quant.py).

The reference's int8 path is dead code (its quantized filename never matches
— /root/reference/src/data/models.py:130-131 vs train_model.py:232, SURVEY
Q2). These tests cover the real TPU-native replacement: same float params
tree, forward-time int8 transform, bounded numeric deviation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepemia_tpu.models.quant import (
    Int8Conv,
    quantize_activation,
    quantize_weight,
)


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    # per-channel scales: scale channel 3 up 50x — per-tensor quant would
    # crush every other channel to ~2 bits
    w = w.at[..., 3].multiply(50.0)
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * scale
    rel = np.linalg.norm(back - w) / np.linalg.norm(w)
    assert rel < 0.012
    # each channel individually well-quantized (the per-channel property)
    for c in (0, 3, 15):
        r = np.linalg.norm(back[..., c] - w[..., c]) / np.linalg.norm(w[..., c])
        assert r < 0.012


def test_quantize_activation_symmetric():
    x = jnp.asarray([[-4.0, 0.0, 2.0, 4.0]])
    q, scale = quantize_activation(x)
    assert q.dtype == jnp.int8
    assert scale.shape == (1, 1)  # per batch element, broadcastable
    np.testing.assert_allclose(np.asarray(q[0]), [-127, 0, 64, 127], atol=1)
    np.testing.assert_allclose(float(scale.squeeze()), 4.0 / 127.0, rtol=1e-6)


def test_quantize_activation_per_batch_element():
    # one outlier element must not coarsen the other elements' grids
    x = jnp.stack([jnp.full((4,), 1.0), jnp.full((4,), 100.0)])
    q, scale = quantize_activation(x)
    np.testing.assert_allclose(
        np.asarray(scale).squeeze(), [1.0 / 127.0, 100.0 / 127.0], rtol=1e-6
    )
    assert int(jnp.abs(q).max()) == 127 and int(jnp.abs(q).min()) == 127


def test_quantize_activation_zero_input():
    q, scale = quantize_activation(jnp.zeros((4, 4)))
    assert float(scale.min()) > 0  # eps guard: no div-by-zero NaNs
    assert int(jnp.abs(q).max()) == 0


@pytest.mark.parametrize(
    "ks,pad,strides,bias",
    [
        ((3, 3), [(1, 1), (1, 1)], (1, 1), False),
        ((1, 1), "SAME", (2, 2), True),
        ((7, 7), [(3, 3), (3, 3)], (2, 2), False),
    ],
)
def test_int8_conv_matches_float(rng, ks, pad, strides, bias):
    """Same params tree applies to both conv flavors; int8 output within
    ~2% relative error of the float conv."""
    import flax.linen as nn

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32) * 3.0)
    ref = nn.Conv(12, ks, strides=strides, padding=pad, use_bias=bias)
    q = Int8Conv(12, ks, strides=strides, padding=pad, use_bias=bias)
    p = ref.init(jax.random.PRNGKey(0), x)
    pq = q.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pq)
    assert [np.shape(a) for a in jax.tree_util.tree_leaves(p)] == [
        np.shape(a) for a in jax.tree_util.tree_leaves(pq)
    ]
    y_ref = ref.apply(p, x)
    y_q = q.apply(p, x)
    assert y_q.shape == y_ref.shape
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.03


def test_quant_model_same_params_tree(tiny_r50):
    """quant_backbone='full' consumes the float checkpoint unchanged."""
    model, params = tiny_r50
    qmodel = model.clone(quant_backbone="full")
    img = jnp.zeros((64, 64, 3), jnp.float32)
    qparams = jax.jit(qmodel.init)(jax.random.PRNGKey(0), img)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        qparams
    )


def test_quant_model_detections_agree(tiny_r50):
    """Feature-map agreement between float and int8 forwards on a real
    input: per-level FPN features correlate strongly (detection-level
    agreement on a trained model is measured by tools/bench_int8.py)."""
    model, params = tiny_r50
    qmodel = model.clone(quant_backbone="full")
    rng = np.random.default_rng(7)
    img = jnp.asarray(
        (rng.random((64, 64, 3)) * 255).astype(np.float32)
    )
    model_cls = type(model)
    f_ref = jax.jit(
        lambda p, im: model.apply(p, im, method=model_cls.features)
    )(params, img)
    f_q = jax.jit(
        lambda p, im: qmodel.apply(p, im, method=model_cls.features)
    )(params, img)
    for lv in ("p2", "p3", "p4", "p5"):
        a = np.asarray(f_ref[lv], np.float32).ravel()
        b = np.asarray(f_q[lv], np.float32).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        corr = float(a @ b / denom) if denom > 0 else 1.0
        # random-init feature maps amplify relative error vs trained ones;
        # the bound here is a structural sanity floor, not the AP claim
        assert corr > 0.95, (lv, corr)


@pytest.mark.compiles
def test_quant_split_serving_engine(tiny_r50):
    """The TPU production schedule (split serving: conv-pure P1 + heads P2)
    runs with the int8 backbone: quantized convs live in P1 only, and the
    engine produces a finite padded InstanceSet."""
    import numpy as np

    from deepemia_tpu.inference.engine import ClassSettings, TileEngine

    model, params = tiny_r50
    engine = TileEngine(
        model.clone(quant_backbone="trunk"),
        params,
        tile_size=64,
        overlap_ratio=0.2,
        upscale_factor=1.0,
        capacity=32,
        serving="split",
        tile_batch=2,
    )
    settings = ClassSettings(
        confidence=jnp.asarray([0.05, 0.05]),
        nms_iou=jnp.asarray([0.5, 0.5]),
        min_size=jnp.zeros((2,)),
    )
    rng = np.random.default_rng(3)
    img = (rng.random((160, 160, 3)) * 255).astype(np.float32)
    inst, quality = engine.infer(img, settings)
    assert np.isfinite(np.asarray(inst.scores)).all()
    assert inst.boxes.shape == (32, 4)
