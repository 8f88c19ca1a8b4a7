"""deepEMIA-TPU — TPU-native electron-microscopy instance analysis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
deepEMIA pipeline (Mask R-CNN based EM image analysis): dataset prep,
training, COCO evaluation, and a tile-based multi-model inference stack that
turns micrographs into scale-calibrated morphometric measurement CSVs.

Key design differences from the (CUDA/PyTorch) reference:
  * the whole per-image pipeline — model forward, NMS, mask paste, dedup,
    spatial constraints, morphometrics — is a single statically-shaped
    jit-compiled XLA program; no per-instance Python loops on the hot path;
  * tiles are processed as one padded batch and sharded across TPU chips via
    ``jax.sharding`` meshes (the spatial analog of data parallelism);
  * masks live on device from forward pass to measurement reduction.
"""

from deepemia_tpu.version import __version__, VERSION_INFO

__all__ = ["__version__", "VERSION_INFO"]
