"""Device meshes and sharding specs for the framework's parallel axes.

The reference is single-GPU (SURVEY.md §2c: its only concurrency is host
thread pools); the TPU-native scaling axes are:

  * ``data``  — batch/image data parallelism (training);
  * ``model`` — tensor parallelism of the heavy RoI-head FCs (training);
  * ``tile``  — spatial parallelism over a micrograph's tile grid
    (inference; the structural analog of sequence/context parallelism:
    the tile grid is the "sequence" sharded across chips, stitched with
    collectives — SURVEY.md §2c row 2).

Collectives ride ICI within a pod; the artifact plane (GCS/local store)
stays on the host side exactly like the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_model_mesh(n_model: int = 1) -> Mesh:
    """('data','model') mesh over all local devices (training)."""
    devs = np.array(jax.devices())
    n = len(devs)
    n_model = max(1, min(n_model, n))
    while n % n_model:
        n_model -= 1
    return Mesh(devs.reshape(n // n_model, n_model), ("data", "model"))


def tile_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D ('tile',) mesh for sharding a tile grid across chips.

    ``devices``: explicit device list (e.g. a contiguous sub-group from
    :func:`partition_devices` for member-parallel ensembles); defaults to
    the first ``n_devices`` local devices.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("tile",))


def partition_devices(devices, k: int):
    """Split ``devices`` into ``k`` CONTIGUOUS groups (sizes differ by at
    most one, earlier groups larger). Contiguity matters on TPU: the local
    device order follows the physical ICI topology, so each group's
    collectives stay on neighboring chips instead of striding the pod."""
    devices = list(devices)
    n = len(devices)
    k = max(1, min(k, n))
    base, extra = divmod(n, k)
    groups, start = [], 0
    for i in range(k):
        size = base + (1 if i < extra else 0)
        groups.append(devices[start : start + size])
        start += size
    return groups


def pad_to_shards(n: int, n_shards: int) -> int:
    """Smallest multiple of ``n_shards`` >= n."""
    return -(-n // n_shards) * n_shards


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tile_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("tile"))
