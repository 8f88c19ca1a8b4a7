"""Model tests: shapes, anchor parity, RoIAlign vs torchvision, layer
orientation vs torch, full checkpoint conversion tree equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepemia_tpu.models import anchors as A
from deepemia_tpu.models.mask_rcnn import build_model
from deepemia_tpu.models.roi_align import assign_fpn_levels, roi_align_level


def test_cell_anchor_geometry():
    a = A.cell_anchors(32.0)
    # ratio 1.0 anchor is square 32x32 centered at origin
    sq = a[1]
    np.testing.assert_allclose(sq, [-16, -16, 16, 16], atol=1e-4)
    # ratio 0.5 => wide: w = 32*sqrt(2), h = w/2... area preserved
    w = a[0][2] - a[0][0]
    h = a[0][3] - a[0][1]
    assert w * h == pytest.approx(32 * 32, rel=1e-5)
    assert h / w == pytest.approx(0.5, rel=1e-5)


def test_level_anchor_grid():
    anch = np.asarray(A.level_anchors("p4", 2, 3))  # stride 16
    assert anch.shape == (2 * 3 * 3, 4)
    # centers advance by the stride along x
    c0 = (anch[0][:2] + anch[0][2:]) / 2
    c1 = (anch[3][:2] + anch[3][2:]) / 2  # next cell (3 anchors per cell)
    np.testing.assert_allclose(c1 - c0, [16, 0], atol=1e-4)


def test_fpn_level_assignment():
    boxes = jnp.asarray(
        [
            [0, 0, 32, 32],  # small -> p2
            [0, 0, 224, 224],  # canonical -> p4
            [0, 0, 1000, 1000],  # huge -> p5
        ],
        jnp.float32,
    )
    lv = np.asarray(assign_fpn_levels(boxes))
    assert lv.tolist() == [2, 4, 5]


def _np_roi_align(feat_hwc, boxes, out_size, sampling_ratio):
    """Independent numpy RoIAlign (aligned=True) following the torchvision
    CUDA-op definition: per output bin, average of s*s bilinear samples at
    (bin + (k+0.5)/s)/out positions in the half-pixel-offset box frame."""
    h, w, c = feat_hwc.shape
    out = np.zeros((len(boxes), out_size, out_size, c), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        fy, fx = y - y0, x - x0
        y0c, y1c = np.clip([y0, y0 + 1], 0, h - 1)
        x0c, x1c = np.clip([x0, x0 + 1], 0, w - 1)
        return (
            feat_hwc[y0c, x0c] * (1 - fy) * (1 - fx)
            + feat_hwc[y0c, x1c] * (1 - fy) * fx
            + feat_hwc[y1c, x0c] * fy * (1 - fx)
            + feat_hwc[y1c, x1c] * fy * fx
        )

    s = sampling_ratio
    for n, (bx0, by0, bx1, by1) in enumerate(boxes):
        x0, y0 = bx0 - 0.5, by0 - 0.5
        bw, bh = bx1 - bx0, by1 - by0
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c, np.float32)
                for ki in range(s):
                    for kj in range(s):
                        sy = y0 + (i + (ki + 0.5) / s) / out_size * bh
                        sx = x0 + (j + (kj + 0.5) / s) / out_size * bw
                        acc += bilinear(sy, sx)
                out[n, i, j] = acc / (s * s)
    return out


def test_roi_align_matches_reference_semantics():
    rng = np.random.default_rng(0)
    feat = rng.random((24, 24, 8)).astype(np.float32)  # HWC
    boxes = np.array(
        [[4.0, 4.0, 20.0, 16.0], [0.0, 0.0, 23.0, 23.0], [10.5, 3.25, 18.75, 21.0]],
        np.float32,
    )
    expect = _np_roi_align(feat, boxes, 7, 2)
    ours = roi_align_level(
        jnp.asarray(feat), jnp.asarray(boxes), stride=1, output_size=7, sampling_ratio=2
    )
    np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-4)


def _np_roi_align_adaptive(feat_hwc, boxes, out_size, spatial_scale):
    """Adaptive-ratio RoIAlign oracle following the CUDA op with
    sampling_ratio<=0 (POOLER_SAMPLING_RATIO=0 in the zoo configs the
    reference loads): per axis, ceil(roi/out) samples per bin."""
    h, w, c = feat_hwc.shape
    out = np.zeros((len(boxes), out_size, out_size, c), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        fy, fx = y - y0, x - x0
        y0c, y1c = np.clip([y0, y0 + 1], 0, h - 1)
        x0c, x1c = np.clip([x0, x0 + 1], 0, w - 1)
        return (
            feat_hwc[y0c, x0c] * (1 - fy) * (1 - fx)
            + feat_hwc[y0c, x1c] * (1 - fy) * fx
            + feat_hwc[y1c, x0c] * fy * (1 - fx)
            + feat_hwc[y1c, x1c] * fy * fx
        )

    for n, (bx0, by0, bx1, by1) in enumerate(boxes):
        x0 = bx0 * spatial_scale - 0.5
        y0 = by0 * spatial_scale - 0.5
        bw = (bx1 - bx0) * spatial_scale
        bh = (by1 - by0) * spatial_scale
        gx = max(1, int(np.ceil(bw / out_size)))
        gy = max(1, int(np.ceil(bh / out_size)))
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c, np.float32)
                for ki in range(gy):
                    for kj in range(gx):
                        sy = y0 + (i + (ki + 0.5) / gy) / out_size * bh
                        sx = x0 + (j + (kj + 0.5) / gx) / out_size * bw
                        acc += bilinear(sy, sx)
                out[n, i, j] = acc / (gx * gy)
    return out


def test_adaptive_ratio_matches_cuda_adaptive_rule():
    """adaptive_ratio=True must reproduce the CUDA op's ceil(roi/out)
    adaptive sampling (what the reference's zoo configs use via
    POOLER_SAMPLING_RATIO=0) for boxes whose adaptive grid is 1 or 2 per
    axis: roi <= 14 cells for out=7 — i.e. every FPN level 2-4 box."""
    from deepemia_tpu.models.roi_align import multilevel_roi_align

    rng = np.random.default_rng(3)
    feat = rng.random((32, 32, 8)).astype(np.float32)
    # stride-4 level p2: image-coord boxes up to 14*4=56 px stay at grid<=2;
    # mix of grid-1 (roi < 7 cells = 28px) and grid-2 (28..56px) boxes,
    # including one rectangular box with grid 1 in x and 2 in y
    boxes = np.array(
        [
            [8.0, 8.0, 30.0, 30.0],     # 5.5 cells  -> grid 1
            [4.0, 4.0, 52.0, 52.0],     # 12 cells   -> grid 2
            [10.0, 10.0, 34.0, 62.0],   # 6 x 13     -> grid (1, 2)
            [0.0, 0.0, 27.9, 55.9],     # boundary: just under 7 / 14 cells
        ],
        np.float32,
    )
    ours = multilevel_roi_align(
        {"p2": jnp.asarray(feat)},
        jnp.asarray(boxes),
        output_size=7,
        levels=("p2",),
        adaptive_ratio=True,
    )
    expect = _np_roi_align_adaptive(feat, boxes, 7, 1.0 / 4.0)
    np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-4)
    # and it must DIFFER from the fixed-2 grid for the grid-1 box — the
    # emulation is doing something
    fixed = multilevel_roi_align(
        {"p2": jnp.asarray(feat)},
        jnp.asarray(boxes),
        output_size=7,
        levels=("p2",),
        adaptive_ratio=False,
    )
    assert np.abs(np.asarray(ours[0]) - np.asarray(fixed[0])).max() > 1e-5


def test_conv_orientation_matches_torch():
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    from deepemia_tpu.models.weights import _conv, _deconv, _dense

    rng = np.random.default_rng(1)
    x = rng.random((1, 6, 6, 3)).astype(np.float32)
    w = rng.random((5, 3, 3, 3)).astype(np.float32)  # [O,I,kh,kw]
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1, bias=False)
    tconv.weight.data = torch.from_numpy(w)
    expect = tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()

    mod = nn.Conv(5, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    out = mod.apply({"params": {"kernel": jnp.asarray(_conv(w))}}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), expect, atol=1e-4
    )

    # deconv 2x2 stride 2 (the mask head upsample)
    wd = rng.random((4, 6, 2, 2)).astype(np.float32)  # [I,O,kh,kw]
    tdeconv = torch.nn.ConvTranspose2d(4, 6, 2, stride=2, bias=False)
    tdeconv.weight.data = torch.from_numpy(wd)
    xd = rng.random((1, 5, 5, 4)).astype(np.float32)
    expect_d = (
        tdeconv(torch.from_numpy(np.transpose(xd, (0, 3, 1, 2)))).detach().numpy()
    )
    from deepemia_tpu.models.heads import Deconv2x2

    dmod = Deconv2x2(6)
    out_d = dmod.apply(
        {
            "params": {
                "kernel": jnp.asarray(_deconv(wd)),
                "bias": jnp.zeros((6,), jnp.float32),
            }
        },
        jnp.asarray(xd),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_d), (0, 3, 1, 2)), expect_d, atol=1e-4
    )

    # dense
    wl = rng.random((7, 4)).astype(np.float32)
    tl = torch.nn.Linear(4, 7, bias=False)
    tl.weight.data = torch.from_numpy(wl)
    xl = rng.random((2, 4)).astype(np.float32)
    expect_l = tl(torch.from_numpy(xl)).detach().numpy()
    dmod2 = nn.Dense(7, use_bias=False)
    out_l = dmod2.apply({"params": {"kernel": jnp.asarray(_dense(wl))}}, jnp.asarray(xl))
    np.testing.assert_allclose(np.asarray(out_l), expect_l, atol=1e-4)


def test_frozen_bn_folding_matches_torch():
    torch = pytest.importorskip("torch")
    from deepemia_tpu.models.weights import _fold_bn

    rng = np.random.default_rng(2)
    c = 8
    sd = {
        "n.weight": rng.random(c).astype(np.float32),
        "n.bias": rng.random(c).astype(np.float32),
        "n.running_mean": rng.random(c).astype(np.float32),
        "n.running_var": (rng.random(c) + 0.5).astype(np.float32),
    }
    bn = torch.nn.BatchNorm2d(c, eps=1e-5).eval()
    bn.weight.data = torch.from_numpy(sd["n.weight"])
    bn.bias.data = torch.from_numpy(sd["n.bias"])
    bn.running_mean.data = torch.from_numpy(sd["n.running_mean"])
    bn.running_var.data = torch.from_numpy(sd["n.running_var"])
    x = rng.random((1, c, 4, 4)).astype(np.float32)
    expect = bn(torch.from_numpy(x)).detach().numpy()
    folded = _fold_bn(sd, "n")
    got = x * folded["scale"][None, :, None, None] + folded["bias"][None, :, None, None]
    np.testing.assert_allclose(got, expect, atol=1e-5)


def _synthetic_d2_state_dict(depth, num_classes, rng):
    """Random tensors under Detectron2 Mask R-CNN names/shapes."""
    from deepemia_tpu.models.resnet import STAGE_BLOCKS

    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.random((o, i, k, k)).astype(np.float32)

    def norm(name, c):
        for suffix, val in (
            ("weight", rng.random(c)),
            ("bias", rng.random(c)),
            ("running_mean", rng.random(c)),
            ("running_var", rng.random(c) + 0.5),
        ):
            sd[f"{name}.{suffix}"] = val.astype(np.float32)

    bu = "backbone.bottom_up"
    conv(f"{bu}.stem.conv1", 64, 3, 7)
    norm(f"{bu}.stem.conv1.norm", 64)
    channels = (256, 512, 1024, 2048)
    bottlenecks = (64, 128, 256, 512)
    in_c = 64
    for si, nb in enumerate(STAGE_BLOCKS[depth]):
        s = si + 2
        out_c, bn_c = channels[si], bottlenecks[si]
        for b in range(nb):
            base = f"{bu}.res{s}.{b}"
            block_in = in_c if b == 0 else out_c
            if b == 0:
                conv(f"{base}.shortcut", out_c, block_in, 1)
                norm(f"{base}.shortcut.norm", out_c)
            conv(f"{base}.conv1", bn_c, block_in, 1)
            norm(f"{base}.conv1.norm", bn_c)
            conv(f"{base}.conv2", bn_c, bn_c, 3)
            norm(f"{base}.conv2.norm", bn_c)
            conv(f"{base}.conv3", out_c, bn_c, 1)
            norm(f"{base}.conv3.norm", out_c)
        in_c = out_c
    for lvl, c in zip((2, 3, 4, 5), channels):
        conv(f"backbone.fpn_lateral{lvl}", 256, c, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = rng.random(256).astype(np.float32)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = rng.random(256).astype(np.float32)
    rh = "proposal_generator.rpn_head"
    conv(f"{rh}.conv", 256, 256, 3)
    sd[f"{rh}.conv.bias"] = rng.random(256).astype(np.float32)
    conv(f"{rh}.objectness_logits", 3, 256, 1)
    sd[f"{rh}.objectness_logits.bias"] = rng.random(3).astype(np.float32)
    conv(f"{rh}.anchor_deltas", 12, 256, 1)
    sd[f"{rh}.anchor_deltas.bias"] = rng.random(12).astype(np.float32)
    sd["roi_heads.box_head.fc1.weight"] = rng.random((1024, 256 * 49)).astype(
        np.float32
    )
    sd["roi_heads.box_head.fc1.bias"] = rng.random(1024).astype(np.float32)
    sd["roi_heads.box_head.fc2.weight"] = rng.random((1024, 1024)).astype(np.float32)
    sd["roi_heads.box_head.fc2.bias"] = rng.random(1024).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.weight"] = rng.random(
        (num_classes + 1, 1024)
    ).astype(np.float32)
    sd["roi_heads.box_predictor.cls_score.bias"] = rng.random(num_classes + 1).astype(
        np.float32
    )
    sd["roi_heads.box_predictor.bbox_pred.weight"] = rng.random(
        (num_classes * 4, 1024)
    ).astype(np.float32)
    sd["roi_heads.box_predictor.bbox_pred.bias"] = rng.random(num_classes * 4).astype(
        np.float32
    )
    for i in (1, 2, 3, 4):
        conv(f"roi_heads.mask_head.mask_fcn{i}", 256, 256, 3)
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = rng.random(256).astype(
            np.float32
        )
    sd["roi_heads.mask_head.deconv.weight"] = rng.random((256, 256, 2, 2)).astype(
        np.float32
    )
    sd["roi_heads.mask_head.deconv.bias"] = rng.random(256).astype(np.float32)
    conv("roi_heads.mask_head.predictor", num_classes, 256, 1)
    sd["roi_heads.mask_head.predictor.bias"] = rng.random(num_classes).astype(
        np.float32
    )
    return sd


def test_checkpoint_conversion_tree_matches_model(rng):
    from deepemia_tpu.models.mask_rcnn import init_params
    from deepemia_tpu.models.weights import (
        convert_detectron2_state_dict,
        infer_depth,
        infer_num_classes,
    )

    sd = _synthetic_d2_state_dict(50, 3, rng)
    assert infer_depth(sd) == 50
    assert infer_num_classes(sd) == 3
    converted = convert_detectron2_state_dict(sd, 50)

    model = build_model("R50", num_classes=3, use_bf16=False)
    expected = init_params(model, (64, 64))

    conv_paths = {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    exp_paths = {
        "/".join(str(k.key) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    assert conv_paths == exp_paths


def test_fast_grad_roi_align_matches_autodiff():
    """The scatter-free matmul backward must reproduce autodiff of the
    gather forward exactly (f32): same d(features) for interior, border,
    out-of-image, tiny, huge, and extreme-aspect boxes; zero d(boxes) by
    definition."""
    from deepemia_tpu.models.roi_align import (
        multilevel_roi_align,
        multilevel_roi_align_fast_grad,
    )

    rng = np.random.default_rng(7)
    h = w = 64
    feats = {
        f"p{i}": jnp.asarray(
            rng.standard_normal((h >> (i - 2), w >> (i - 2), 8)), jnp.float32
        )
        for i in range(2, 6)
    }
    boxes = jnp.asarray(
        np.array(
            [
                [10.0, 12.0, 30.0, 28.0],  # interior, level 2
                [0.0, 0.0, 63.0, 63.0],  # full image
                [-5.0, -8.0, 10.0, 9.0],  # crosses the top-left border
                [58.0, 58.0, 80.0, 90.0],  # crosses the bottom-right border
                [20.0, 20.0, 20.4, 20.4],  # tiny
                [1.0, 30.0, 62.0, 32.0],  # extreme aspect (62x2)
                [30.0, 1.0, 33.0, 60.0],  # extreme aspect (3x59)
                [5.0, 5.0, 6.0, 6.0],  # 1px
            ],
            np.float32,
        )
    )
    for out_size, adaptive in ((7, True), (14, False)):
        cot = jnp.asarray(
            rng.standard_normal((boxes.shape[0], out_size, out_size, 8)),
            jnp.float32,
        )

        def loss_ref(fs):
            return jnp.vdot(
                multilevel_roi_align(
                    fs, boxes, output_size=out_size, adaptive_ratio=adaptive
                ),
                cot,
            )

        def loss_fast(fs):
            return jnp.vdot(
                multilevel_roi_align_fast_grad(
                    fs, boxes, output_size=out_size, adaptive_ratio=adaptive
                ),
                cot,
            )

        ref = jax.grad(loss_ref)(feats)
        fast = jax.grad(loss_fast)(feats)
        for nm in feats:
            np.testing.assert_allclose(
                np.asarray(fast[nm]),
                np.asarray(ref[nm]),
                rtol=1e-4,
                atol=1e-5,
                err_msg=f"{nm} out={out_size} adaptive={adaptive}",
            )

    # forward values identical, box grads defined as zero
    fwd_ref = multilevel_roi_align(feats, boxes, output_size=7)
    fwd_fast = multilevel_roi_align_fast_grad(feats, boxes, output_size=7)
    np.testing.assert_array_equal(np.asarray(fwd_ref), np.asarray(fwd_fast))
    dbox = jax.grad(
        lambda b: multilevel_roi_align_fast_grad(feats, b, output_size=7).sum()
    )(boxes)
    np.testing.assert_array_equal(np.asarray(dbox), 0.0)


def test_fast_grad_roi_align_under_vmap():
    """The training losses vmap per-image over the batch; the custom VJP
    must batch correctly."""
    from deepemia_tpu.models.roi_align import (
        multilevel_roi_align,
        multilevel_roi_align_fast_grad,
    )

    rng = np.random.default_rng(3)
    feats = {
        f"p{i}": jnp.asarray(
            rng.standard_normal((2, 32 >> (i - 2), 32 >> (i - 2), 4)),
            jnp.float32,
        )
        for i in range(2, 6)
    }
    boxes = jnp.asarray(rng.random((2, 5, 4)) * 16, jnp.float32)
    boxes = boxes.at[..., 2:].add(boxes[..., :2] + 2.0)

    def batched(fn, fs):
        return jax.vmap(
            lambda f, b: fn(f, b, output_size=7).sum(), in_axes=(0, 0)
        )(fs, boxes).sum()

    ref = jax.grad(lambda fs: batched(multilevel_roi_align, fs))(feats)
    fast = jax.grad(lambda fs: batched(multilevel_roi_align_fast_grad, fs))(
        feats
    )
    for nm in feats:
        np.testing.assert_allclose(
            np.asarray(fast[nm]), np.asarray(ref[nm]), rtol=1e-4, atol=1e-5
        )
