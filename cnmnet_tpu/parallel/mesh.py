"""Device mesh construction and named shardings.

The reference's entire distribution story is single-process
``nn.DataParallel`` (`train.py:111-124`, SURVEY.md §2.14). The TPU framework
replaces it with the GSPMD model: a logical ``("data", "tile")`` mesh —
batch data-parallelism over ``data`` (across hosts via DCN when multi-host),
spatial tiling of the large per-image tensors over ``tile`` (within a host,
collectives riding ICI) — annotated shardings, and XLA-inserted collectives.
No explicit communication backend exists anywhere in this codebase; psum /
all-gather / halo exchanges are all derived from sharding annotations (or
`shard_map` in `sharding.py` where we want them explicit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    tile: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "tile") mesh.

    data=-1 consumes all remaining devices. With multiple processes the mesh
    spans all processes' devices (jax.devices() is global after
    ``jax.distributed.initialize``).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % tile == 0, (n, tile)
        data = n // tile
    assert data * tile == n, f"mesh {data}x{tile} != {n} devices"
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Shard dim 0 over "data"; optionally a spatial dim over "tile"."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_dim is not None and mesh.shape["tile"] > 1:
        spec[spatial_dim] = "tile"
    return NamedSharding(mesh, P(*spec))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    per_proc = global_batch // jax.process_count()
    assert per_proc * jax.process_count() == global_batch
    return per_proc
