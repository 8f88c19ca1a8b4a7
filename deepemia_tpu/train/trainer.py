"""Training loop: pjit data-parallel train step, Orbax checkpoints, schedule.

Parity surface: reference ``src/functions/train_model.py`` —
``train_with_backbone`` (:111-247: zoo cfg, auto MAX_ITER from dataset size
:137-144, LR steps at 60/80% :145-148, warmup factor 1e-3, COCO eval after
training, final-weights copy to ``model_final_{r50,r101}``) and
``train_on_dataset`` (:321-409). Differences by design:

  * the SGD step is one pjit'd XLA program sharded over a
    ``('data','model')`` mesh: batch data-parallel over 'data', the heavy
    box-head FC kernels tensor-parallel over 'model' (GSPMD inserts the
    all-reduces) — replacing the reference's single-GPU loop;
  * checkpoint/resume is real (Orbax CheckpointManager with step numbering);
    the reference's ``resume_or_load(resume=False)`` never resumes
    (SURVEY.md checkpoint notes);
  * backbone stem+res2 and all frozen-BN affines are excluded from updates
    (Detectron2 FREEZE_AT=2 + BN buffers), via an optax mask.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepemia_tpu.models.mask_rcnn import MaskRCNN, build_model, init_params
from deepemia_tpu.train.losses import GroundTruth, maskrcnn_loss

log = logging.getLogger("deepemia_tpu.trainer")


# ---------------------------------------------------------------------------
# Schedule / optimizer
# ---------------------------------------------------------------------------


def warmup_multistep_schedule(
    base_lr: float,
    max_iter: int,
    warmup_iters: int = 1000,
    warmup_factor: float = 1e-3,
    gamma: float = 0.1,
    step_fractions=(0.6, 0.8),
):
    """Detectron2 WarmupMultiStepLR (train_model.py:136-151 semantics)."""
    steps = [int(f * max_iter) for f in step_fractions]

    def schedule(count):
        warm = jnp.where(
            count < warmup_iters,
            warmup_factor + (1.0 - warmup_factor) * count / max(warmup_iters, 1),
            1.0,
        )
        decay = jnp.ones(())
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * warm * decay

    return schedule


def _trainable_mask(params) -> Any:
    """False for frozen leaves: stem, res2, every FrozenBN affine."""

    def decide(path, _leaf):
        keys = [str(k.key) for k in path]
        joined = "/".join(keys)
        if "stem_conv" in joined or "stem_norm" in joined:
            return False
        if any(k.startswith("res2_block") for k in keys):
            return False
        if any(k.startswith("norm") or k.endswith("_norm") for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    base_lr: float,
    max_iter: int,
    warmup_iters: int = 1000,
    gamma: float = 0.1,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    params=None,
    grad_clip_norm: Optional[float] = None,
):
    """``grad_clip_norm``: optional global-norm gradient clipping
    (Detectron2 SOLVER.CLIP_GRADIENTS). Strongly recommended for
    from-scratch training: FrozenBN provides no activation normalization,
    so early RPN-regression gradients can diverge — the reference never
    hits this because it always fine-tunes from zoo weights."""
    schedule = warmup_multistep_schedule(
        base_lr, max_iter, warmup_iters, gamma=gamma
    )
    steps = [optax.add_decayed_weights(weight_decay)]
    if grad_clip_norm:
        steps.insert(0, optax.clip_by_global_norm(grad_clip_norm))
    tx = optax.chain(
        *steps,
        optax.sgd(learning_rate=schedule, momentum=momentum),
    )
    if params is not None:
        labels = jax.tree.map(
            lambda t: "train" if t else "freeze", _trainable_mask(params)
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )


# ---------------------------------------------------------------------------
# Sharded train step
# ---------------------------------------------------------------------------


def make_mesh(n_model: int = 1, max_data: Optional[int] = None) -> Mesh:
    """('data','model') mesh over local devices.

    ``max_data`` caps the data axis (it must divide the global batch); when
    the batch is smaller than the device count, only batch-many devices are
    used for the data axis.
    """
    import math

    devs = jax.devices()
    n = len(devs)
    n_model = max(1, min(n_model, n))
    while n % n_model:
        n_model -= 1
    data = n // n_model
    if max_data is not None:
        data = math.gcd(data, max_data) if max_data < data else data
    return Mesh(
        np.array(devs[: data * n_model]).reshape(data, n_model),
        ("data", "model"),
    )


def _tp_spec_for_path(path, leaf) -> P:
    """Tensor-parallel placement rule, applied uniformly to params AND their
    mirrored optimizer-state trees (momentum traces carry the same key names):
    box-head fc1 column-parallel / fc2 row-parallel over 'model' (GSPMD adds
    the all-reduce between them), everything else replicated."""
    keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    keys = [str(k) for k in keys]
    if getattr(leaf, "ndim", 0) == 2 and "box_head" in keys and "kernel" in keys:
        if "fc1" in keys:
            return P(None, "model")
        if "fc2" in keys:
            return P("model", None)
    return P()


def param_pspecs(tree) -> Any:
    """PartitionSpec tree for any params-shaped pytree."""
    return jax.tree_util.tree_map_with_path(_tp_spec_for_path, tree)


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for the full TrainState (step/opt_state included)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _tp_spec_for_path(path, leaf)),
        state,
    )


def batch_pspecs() -> Dict[str, P]:
    return {
        "image": P("data"),
        "gt_boxes": P("data"),
        "gt_classes": P("data"),
        "gt_valid": P("data"),
        "gt_masks": P("data"),
    }


def pack_batch_bytes(batch: Dict[str, np.ndarray], key_data: np.ndarray):
    """Serialize a whole train batch + PRNG key into ONE [B, L] uint8 buffer.

    The trainer loop used to issue six device_puts per step (five batch
    fields + the key); on a tunneled device every put is a full host round
    trip, which capped production throughput at ~13 steps/s while the step
    itself ran at 24 (tools/profile_train_step.py). One per-example byte
    row keeps the 'data'-axis sharding and costs ONE transfer.

    Layout per example (each field 4-byte aligned):
      image u8 [S,S,3] | boxes f32 [G,4] | classes i32 [G] | valid u8 [G]
      | masks u8 [G,S,S//8] (np.packbits) | key u32 [2] (same every row).
    """
    b = batch["image"].shape[0]
    parts = []

    def add(x):
        raw = np.ascontiguousarray(x).reshape(b, -1).view(np.uint8)
        if raw.shape[1] % 4:
            raw = np.pad(raw, ((0, 0), (0, (-raw.shape[1]) % 4)))
        parts.append(raw)

    add(batch["image"].astype(np.uint8, copy=False))
    add(batch["gt_boxes"].astype(np.float32, copy=False))
    add(batch["gt_classes"].astype(np.int32, copy=False))
    add(batch["gt_valid"].astype(np.uint8, copy=False))
    masks = batch["gt_masks"]
    if masks.dtype != np.uint8:  # accept raw bool for test callers
        masks = np.packbits(masks, axis=-1)
    add(masks)
    key_row = np.ascontiguousarray(key_data, dtype=np.uint32).view(np.uint8)
    parts.append(np.broadcast_to(key_row[None], (b, 8)))
    return np.concatenate(parts, axis=1)


def unpack_batch_bytes(buf: jnp.ndarray, s: int, g: int):
    """Device-side inverse of ``pack_batch_bytes`` (runs inside the jitted
    step — the slices/bitcasts fuse into their consumers)."""
    b = buf.shape[0]
    off = [0]

    def take(n):
        sl = jax.lax.slice_in_dim(buf, off[0], off[0] + n, axis=1)
        off[0] += n + ((-n) % 4)
        return sl

    image = take(s * s * 3).reshape(b, s, s, 3)  # uint8; loss casts
    boxes = jax.lax.bitcast_convert_type(
        take(g * 16).reshape(b, g, 4, 4), jnp.float32
    )
    classes = jax.lax.bitcast_convert_type(
        take(g * 4).reshape(b, g, 4), jnp.int32
    )
    valid = take(g).reshape(b, g).astype(bool)
    masks = take(g * s * (s // 8)).reshape(b, g, s, s // 8)  # stays packed
    key = jax.lax.bitcast_convert_type(take(8)[0].reshape(2, 4), jnp.uint32)
    batch = {
        "image": image,
        "gt_boxes": boxes,
        "gt_classes": classes,
        "gt_valid": valid,
        "gt_masks": masks,
    }
    return batch, key


def unpack_mask_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., W//8] uint8 (np.packbits bitorder='big' layout) -> [..., W] bool.

    Device-side inverse of the loader's transfer packing: GT masks cross the
    host->device link bit-packed (8x fewer bytes; the padded bool tensor was
    ~94% of the measured step time over the axon tunnel) and are expanded
    here inside the jitted step, where the unpack fuses into the mask-crop
    consumers.
    """
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(bool)


def build_train_step(
    model: MaskRCNN,
    mesh: Mesh,
    tx,
    loss_caps: Optional[dict] = None,
    state_template: Optional[TrainState] = None,
    packed_shape: Optional[Tuple[int, int]] = None,
    with_chunks: bool = False,
    donate: bool = True,
):
    """jit-compiled sharded train step: (state, batch, rng) -> (state, metrics).

    ``loss_caps`` overrides the static proposal/sample capacities (tiny for
    dry runs / CI, Detectron2 defaults for production).

    ``packed_shape=(train_size, max_instances)``: ALSO return a packed-wire
    step ``(state, buf [B,L] uint8) -> (state, metrics)`` consuming
    ``pack_batch_bytes`` rows (batch + key in one transfer). Returns
    ``(step_fn, batch_shardings, packed_fn, packed_sharding)`` then.

    ``with_chunks=True`` (requires ``packed_shape``): ALSO return a
    multi-step program ``(state, bufs [K,B,L]) -> (state, metrics [K])``
    that lax.scans the SAME step over K packed batches — byte-identical
    math and [seed, step] key streams, but one dispatch + one transfer per
    K steps instead of per step. On a tunneled device the per-step host
    round trip is what separates the ~17.7 steps/s production rate from
    the 24.1 steps/s device-resident rate. Returns
    ``(step_fn, batch_shardings, packed_fn, packed_sharding, chunk_fn,
    chunk_sharding)`` then.
    """
    caps = loss_caps or {}

    def loss_fn(params, batch, rng):
        b = batch["image"].shape[0]
        rngs = jax.random.split(rng, b)

        def per_image(img, boxes, classes, valid, masks, r):
            if masks.dtype == jnp.uint8:  # loader's bit-packed transfer format
                masks = unpack_mask_bits(masks)
            gt = GroundTruth(boxes=boxes, classes=classes, valid=valid, masks=masks)
            return maskrcnn_loss(model, params, img, gt, r, **caps)

        losses = jax.vmap(per_image)(
            batch["image"],
            batch["gt_boxes"],
            batch["gt_classes"],
            batch["gt_valid"],
            batch["gt_masks"],
            rngs,
        )
        mean_losses = jax.tree.map(jnp.mean, losses)
        return mean_losses["total"], mean_losses

    def step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt
            ),
            metrics,
        )

    # donation of the TrainState buffers: on for production (halves the
    # peak param+opt memory); performance.donate_buffers=false keeps the
    # pre-step state alive, e.g. to inspect it after a NaN step
    _dn = (0,) if donate else ()
    batch_shardings = {
        k: NamedSharding(mesh, v) for k, v in batch_pspecs().items()
    }
    if state_template is not None:
        st_sh = state_shardings(state_template, mesh)
        repl = NamedSharding(mesh, P())
        fn = jax.jit(
            step,
            in_shardings=(st_sh, batch_shardings, repl),
            out_shardings=(st_sh, repl),
            donate_argnums=_dn,
        )
    else:
        fn = jax.jit(step, donate_argnums=_dn)
    if packed_shape is None:
        return fn, batch_shardings

    ts, gmax = packed_shape

    def step_packed(state: TrainState, buf):
        batch, key = unpack_batch_bytes(buf, ts, gmax)
        return step(state, batch, key)

    packed_sharding = NamedSharding(mesh, P("data"))
    # the buffer is NOT donated: its bytes feed bitcasts of different
    # shapes, so XLA can never reuse it and would warn every compile
    if state_template is not None:
        packed_fn = jax.jit(
            step_packed,
            in_shardings=(st_sh, packed_sharding),
            out_shardings=(st_sh, repl),
            donate_argnums=_dn,
        )
    else:
        packed_fn = jax.jit(step_packed, donate_argnums=_dn)
    if not with_chunks:
        return fn, batch_shardings, packed_fn, packed_sharding

    def step_chunk(state: TrainState, bufs):
        def body(st, buf):
            batch, key = unpack_batch_bytes(buf, ts, gmax)
            return step(st, batch, key)

        return jax.lax.scan(body, state, bufs)

    # the step axis (K) is unsharded; each [B,L] slice keeps the data split
    chunk_sharding = NamedSharding(mesh, P(None, "data"))
    if state_template is not None:
        chunk_fn = jax.jit(
            step_chunk,
            in_shardings=(st_sh, chunk_sharding),
            out_shardings=(st_sh, repl),
            donate_argnums=_dn,
        )
    else:
        chunk_fn = jax.jit(step_chunk, donate_argnums=_dn)
    return (
        fn,
        batch_shardings,
        packed_fn,
        packed_sharding,
        chunk_fn,
        chunk_sharding,
    )


def dispatch_chunk_end(
    i: int, k: int, max_iter: int, checkpoint_every: int
) -> int:
    """End (exclusive) of the dispatch chunk starting at step ``i``.

    Chunks never cross a checkpoint boundary or ``max_iter``, so the set of
    reachable checkpoint/resume points is identical to single-step
    execution regardless of ``k`` (``steps_per_dispatch``)."""
    nxt_ckpt = ((i // checkpoint_every) + 1) * checkpoint_every
    return min(i + k, max_iter, nxt_ckpt)


# ---------------------------------------------------------------------------
# High-level training orchestration
# ---------------------------------------------------------------------------


@dataclass
class TrainConfig:
    backbone: str = "R50"
    base_lr: float = 0.00025
    ims_per_batch: int = 2
    max_iter: Optional[int] = None
    warmup_iters: int = 1000
    gamma: float = 0.1
    train_size: int = 512
    # 'fixed' or 'range' (Detectron2 shortest-edge schedule inside the
    # static train_size canvas — see data/loader.prepare_sample)
    resize_mode: str = "fixed"
    min_size_range: Tuple[int, int] = (640, 800)
    max_size: int = 1333
    max_instances: int = 64
    # data-loader producer threads (reference DATALOADER.NUM_WORKERS);
    # 1 = deterministic batch order
    loader_workers: int = 2
    # train steps executed per device dispatch (lax.scan over K packed
    # batches shipped as one [K,B,L] transfer). Byte-identical math and
    # random streams to K single steps; only the dispatch granularity
    # changes. On a tunneled/remote device the per-step round trip
    # otherwise caps the loop well below the device-resident step rate.
    # Chunks never cross checkpoint boundaries (remainders run the
    # single-step program), so resume points are unchanged. 1 = off.
    steps_per_dispatch: int = 8
    augment: bool = False
    checkpoint_every: int = 1000
    log_every: int = 20
    n_model_shards: int = 1
    use_bf16: bool = True
    # RoIAlign backend for the differentiated heads: 'auto' = Pallas
    # window-DMA forward + matmul backward on TPU (A/B on v5e: 40.5 vs
    # 53.0 ms/step — the XLA point-gather forward is descriptor-bound),
    # XLA gather forward elsewhere. Both share the scatter-free backward.
    roi_backend: str = "auto"
    seed: int = 0
    # static proposal/sample capacity overrides (tiny for CI/dry runs)
    loss_caps: Optional[dict] = None
    # zoo/pretrained weights to fine-tune from (Detectron2 .pth/.pkl, a
    # Caffe2 backbone pickle, or an Orbax dir) — the reference always
    # initializes training this way (train_model.py:128-134)
    init_checkpoint: Optional[str] = None
    # global-norm gradient clipping; essential for from-scratch training
    # (FrozenBN has no stabilizing normalization)
    grad_clip_norm: Optional[float] = None
    # donate the TrainState buffers to each step (performance.donate_buffers)
    donate_buffers: bool = True
    # zero-init every residual branch's last norm scale when training from
    # RANDOM init ("bag of tricks" zero-gamma): the trunk starts as a near
    # identity, activations stay O(1) instead of compounding through 16
    # unnormalized residual adds (FrozenBN never re-centers), and the RPN
    # regression actually converges. Ignored when fine-tuning.
    zero_init_residual: bool = True


def zero_residual_norms(params, stem_scale: float = 1.0 / 120.0):
    """From-scratch initialization conditioning (no effect on fine-tuning):

    * zero the scale of each bottleneck's LAST norm (norm3) so every
      residual block starts as identity (the standard zero-gamma trick);
    * scale the stem norm by ~1/std(pixels): the Detectron2 input
      convention is PIXEL_STD=1 (Caffe backbones expect raw ±120 inputs),
      so a randomly-initialized stem emits features of scale ~100 and
      nothing downstream ever re-normalizes them (FrozenBN is a fixed
      affine). At that scale the pure-L1 RPN regression limit-cycles
      (gradient magnitude is constant, step size ∝ lr·‖x‖²) and never
      converges; ~unit features restore normal training dynamics.
    """

    def visit(path, leaf):
        keys = [str(getattr(k, "key", "")) for k in path]
        if (
            any(k.startswith("res") and "_block" in k for k in keys)
            and "norm3" in keys
            and "scale" in keys
        ):
            return jnp.zeros_like(leaf)
        if "stem_norm" in keys and "scale" in keys:
            return leaf * stem_scale
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def auto_max_iter(num_images: int) -> int:
    """Reference auto schedule (train_model.py:137-144): 200·N images below
    100 images else 100·N, floor 1000."""
    per = 200 if num_images < 100 else 100
    return max(1000, per * num_images)


def train(
    records: List[dict],
    num_classes: int,
    output_dir: str,
    cfg: TrainConfig = TrainConfig(),
    init_checkpoint: Optional[str] = None,
    resume: bool = True,
    max_steps_override: Optional[int] = None,
) -> Tuple[str, Dict[str, float]]:
    """Train Mask R-CNN on registered records; returns (checkpoint_path,
    final metrics)."""
    import orbax.checkpoint as ocp

    from deepemia_tpu.data.loader import TrainLoader
    from deepemia_tpu.data.models import save_orbax_checkpoint

    os.makedirs(output_dir, exist_ok=True)
    max_iter = max_steps_override or cfg.max_iter or auto_max_iter(len(records))
    train_roi = cfg.roi_backend
    if train_roi == "auto":
        train_roi = (
            "pallas_fast_grad"
            if jax.default_backend() == "tpu"
            else "xla_fast_grad"
        )
    model = build_model(
        cfg.backbone,
        num_classes,
        use_bf16=cfg.use_bf16,
        train_roi_backend=train_roi,
    )

    init_checkpoint = init_checkpoint or cfg.init_checkpoint
    if init_checkpoint and init_checkpoint.endswith((".pth", ".pkl")):
        # zoo/pretrained fine-tune path: overlay every compatible tensor,
        # re-init class-count-dependent heads (reference always fine-tunes
        # from model-zoo COCO weights, train_model.py:128-134)
        from deepemia_tpu.models.weights import load_pretrained_params

        params, info = load_pretrained_params(
            os.path.expanduser(init_checkpoint),
            model,
            num_classes,
            init_hw=(cfg.train_size, cfg.train_size),
            seed=cfg.seed,
        )
        log.info(
            "Fine-tuning from %s (%d tensors loaded, %d head/shape re-inits)",
            init_checkpoint,
            info["used"],
            len(info["skipped"]),
        )
    elif init_checkpoint:
        from deepemia_tpu.data.models import load_model

        _, params = load_model(init_checkpoint, num_classes, cfg.use_bf16)
    else:
        params = init_params(model, (cfg.train_size, cfg.train_size), cfg.seed)
        if cfg.zero_init_residual:
            params = zero_residual_norms(params)

    # Freezing (FREEZE_AT=2 + FrozenBN affines) exists to protect
    # PRETRAINED early layers (Detectron2 fine-tune semantics). Training
    # from random init has nothing to protect — freezing would even pin the
    # zero-init residual gammas at zero permanently — so everything trains.
    freeze_mask_params = params if init_checkpoint else None
    tx = make_optimizer(
        cfg.base_lr,
        max_iter,
        cfg.warmup_iters,
        cfg.gamma,
        params=freeze_mask_params,
        grad_clip_norm=cfg.grad_clip_norm,
    )
    state = TrainState.create(params, tx)
    mesh = make_mesh(cfg.n_model_shards, max_data=cfg.ims_per_batch)
    (
        step_fn,
        batch_shardings,
        packed_fn,
        packed_sharding,
        chunk_fn,
        chunk_sharding,
    ) = build_train_step(
        model,
        mesh,
        tx,
        cfg.loss_caps,
        state_template=state,
        packed_shape=(cfg.train_size, cfg.max_instances),
        with_chunks=True,
        donate=cfg.donate_buffers,
    )
    # place the state under its sharding (TP leaves split over 'model')
    state = jax.device_put(state, state_shardings(state, mesh))

    # real resume (unlike reference train_model.py:190)
    mngr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(output_dir, "ckpts")),
        options=ocp.CheckpointManagerOptions(max_to_keep=2),
    )
    start_step = 0
    if resume and mngr.latest_step() is not None:
        start_step = mngr.latest_step()
        restored = mngr.restore(
            start_step,
            args=ocp.args.StandardRestore(
                {"params": state.params, "opt_state": state.opt_state}
            ),
        )
        state = state.replace(
            step=jnp.asarray(start_step, jnp.int32),
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        log.info("Resumed from step %d", start_step)

    loader = TrainLoader(
        records,
        cfg.ims_per_batch,
        cfg.train_size,
        cfg.max_instances,
        cfg.augment,
        cfg.seed,
        resize_mode=cfg.resize_mode,
        min_size_range=tuple(cfg.min_size_range),
        max_size=cfg.max_size,
        workers=cfg.loader_workers,
    )
    metrics: Dict[str, float] = {}
    log.info(
        "Training %s: steps %d-%d (B=%d, %dpx, dispatch chunk %d) — first "
        "step compiles the program (minutes on CPU, ~20-40s on TPU)",
        cfg.backbone, start_step, max_iter, cfg.ims_per_batch,
        cfg.train_size, max(1, int(cfg.steps_per_dispatch)),
    )
    t0 = time.time()
    try:
        # double-buffer: the NEXT batch's host->device transfer is issued
        # right after the (async) step dispatch, so it rides alongside the
        # device compute instead of serializing in front of it.
        #
        # The whole batch + the per-step PRNG key cross the link as ONE
        # pack_batch_bytes buffer: six separate device_puts per step each
        # paid a full host round trip on a tunneled device, capping the
        # loop at ~13 steps/s while the step itself ran at 24. Keys are
        # raw [seed, step] threefry data (resume-stable random streams —
        # an eager jax.random.split chain is a synchronous ~30 ms dispatch
        # per step and was never resume-stable).
        loader_iter = iter(loader)
        seed32 = np.uint32(cfg.seed & 0xFFFFFFFF)
        k = max(1, int(cfg.steps_per_dispatch))

        def chunk_end(i: int) -> int:
            return dispatch_chunk_end(i, k, max_iter, cfg.checkpoint_every)

        def put_chunk(i: int):
            """Pack the batches for steps [i, chunk_end(i)) and transfer
            them as ONE buffer. Full K-sized chunks feed the scanned
            multi-step program; remainders feed the single-step program."""
            e = chunk_end(i)
            rows = []
            for j in range(i, e):
                key_data = np.array(
                    [seed32, np.uint32(j & 0xFFFFFFFF)], np.uint32
                )
                rows.append(pack_batch_bytes(next(loader_iter), key_data))
            if e - i == k and k > 1:
                return e, "chunk", jax.device_put(
                    np.stack(rows), chunk_sharding
                )
            return e, "steps", [
                jax.device_put(r, packed_sharding) for r in rows
            ]

        pending = put_chunk(start_step) if start_step < max_iter else None
        lagged = None  # (step, device metrics) awaiting a stall-free log
        i = start_step
        while i < max_iter:
            e, kind, payload = pending
            if kind == "chunk":
                state, m = chunk_fn(state, payload)
                # metrics come back stacked [K]; keep the chunk's last step
                m = jax.tree.map(lambda v: v[-1], m)
            else:
                for buf in payload:
                    state, m = packed_fn(state, buf)
            if e < max_iter:
                pending = put_chunk(e)
            if (e // cfg.log_every) > (i // cfg.log_every) or e == max_iter:
                # log the PREVIOUS interval's metrics (those device values
                # materialized long ago, so float() returns immediately);
                # converting the just-dispatched step's metrics would drain
                # the whole dispatch pipeline every interval. The final
                # step converts its own metrics — that sync is the natural
                # end-of-training barrier.
                if e == max_iter:
                    lagged = (e, m)
                if lagged is not None:
                    at_step, lm = lagged
                    metrics = {k_: float(v) for k_, v in lm.items()}
                    rate = (e - start_step) / (time.time() - t0)
                    log.info(
                        "step %d/%d loss %.4f (rpn %.3f/%.3f cls %.3f box "
                        "%.3f mask %.3f) %.2f it/s",
                        at_step,
                        max_iter,
                        metrics["total"],
                        metrics["rpn_cls"],
                        metrics["rpn_loc"],
                        metrics["cls"],
                        metrics["box"],
                        metrics["mask"],
                        rate,
                    )
                lagged = (e, m)
            if e % cfg.checkpoint_every == 0 or e == max_iter:
                mngr.save(
                    e,
                    args=ocp.args.StandardSave(
                        {"params": state.params, "opt_state": state.opt_state}
                    ),
                )
            i = e
    finally:
        loader.close()
    mngr.wait_until_finished()

    # final weights under the discovery naming (train_model.py:230-238)
    suffix = cfg.backbone.lower()
    final = os.path.join(output_dir, f"model_final_{suffix}.orbax")
    save_orbax_checkpoint(
        jax.device_get(state.params),
        final,
        cfg.backbone,
        num_classes,
        init_hw=(64, 64),
    )
    log.info("Final checkpoint: %s", final)
    return final, metrics
