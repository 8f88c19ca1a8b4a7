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
