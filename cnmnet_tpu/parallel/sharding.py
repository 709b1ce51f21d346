"""Sharding rules and explicit collectives.

Two layers of distribution, per SURVEY.md §5's "sequence-parallel analogue"
(the spatial axes of the cost volume and the normal stencil):

* **GSPMD annotations** (`constrain_spatial`, `shard_batch`): inside the
  jitted train/eval step, large NHWC activations are constrained to
  ``P("data", "tile")`` over (batch, H). XLA partitions the convolutions with
  automatic halo exchange and turns batch-norm / loss reductions into psums.
  This is the default path.
* **Explicit halo exchange** (`halo_exchange_rows`): a `shard_map`-level
  primitive used by the spatially-tiled depth->normal stencil where we want
  the communication schedule pinned (k//2 rows to each neighbor over the
  "tile" axis via `lax.ppermute` — ICI neighbor traffic only, matching the
  ring layout of a TPU slice).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# The CNM conv schedule as (extent divisor, kernel, stride) per windowed
# stage whose input rows may ride the "tile" axis: DepthNet's five stride-2
# double-convs (kernels 7/5/3/3/3 at 1/1..1/16 input extents), its stride-1
# decoder at 1/32, and RefineNet's three stride-2 k=3 blocks with a 1/8
# decoder. Used by `tile_partition_safe`.
_CNM_TILE_STAGES = (
    (1, 7, 2), (2, 5, 2), (4, 3, 2), (8, 3, 2), (16, 3, 2),  # DepthNet enc
    (32, 3, 1),                                              # DepthNet dec
    (1, 3, 2), (2, 3, 2), (4, 3, 2),                         # RefineNet enc
    (8, 3, 1),                                               # RefineNet dec
)


def tile_partition_safe(height: int, tile: int) -> tuple:
    """Is row-sharding this image height over ``tile`` devices SAFE?

    XLA's GSPMD partitioner implements conv halo exchange with transfers to
    ADJACENT shards only; when a windowed op's per-shard extent is small
    relative to its kernel reach it SILENTLY produces wrong values (no
    error, no fallback — measured round 5 on jax 0.9/XLA:CPU: stride-2 k=3
    wrong at per-shard <= 2, exact at >= 4; stride-2 k=5 wrong at <= 4;
    stride-1 k=3 wrong at 1; `tests/test_parallel.py` pins the repro).
    This applies the measured-safe rule — per-shard extent >= 2(k-1) for
    stride-2 stages and >= k-1 for stride-1 — across the CNM conv schedule.

    Returns (safe: bool, reason: str).
    """
    if tile <= 1:
        return True, ""
    if height % tile:
        return False, f"height {height} not divisible by tile {tile}"
    for divisor, k, stride in _CNM_TILE_STAGES:
        extent = height // divisor
        need = 2 * (k - 1) if stride == 2 else (k - 1)
        if extent // tile < need:
            return False, (
                f"per-shard extent {extent}//{tile}={extent // tile} at the "
                f"1/{divisor}-res k={k} s={stride} conv is below the "
                f"GSPMD-halo-safe minimum {need} (adjacent-shard-only halo "
                f"exchange miscompiles silently; see parallel/sharding.py)"
            )
    return True, ""


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, NamedSharding]:
    """NamedShardings for a training batch: batch dim over "data".

    Spatial dims are deliberately left unsharded at the host boundary — the
    step constrains activations to the tile axis internally where profitable.
    """
    out = {}
    for k, v in batch.items():
        spec = [None] * v.ndim
        spec[0] = "data"
        out[k] = NamedSharding(mesh, P(*spec))
    return out


def constrain_spatial(x: jnp.ndarray, mesh: Optional[Mesh], h_dim: int = 1):
    """Constrain an activation to P("data", ..., "tile" at h_dim, ...)."""
    if mesh is None or mesh.shape.get("tile", 1) == 1:
        return x
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[h_dim] = "tile"
    return lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str = "tile"):
    """Exchange `halo` edge rows with ring neighbors along a shard_map axis.

    Args:
      x: per-shard array ``[..., H_local, W, C]`` with rows split along
        ``axis_name``; row axis is -3.
      halo: number of rows to receive from each neighbor.

    Returns:
      ``[..., H_local + 2*halo, W, C]`` — the local rows with `halo` rows of
      top neighbor's bottom edge prepended and bottom neighbor's top edge
      appended (zeros at the global image border).
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        pad = [(0, 0)] * x.ndim
        pad[-3] = (halo, halo)
        return jnp.pad(x, pad)
    idx = lax.axis_index(axis_name)

    top_edge = lax.slice_in_dim(x, 0, halo, axis=-3)
    bot_edge = lax.slice_in_dim(x, x.shape[-3] - halo, x.shape[-3], axis=-3)

    # send my bottom edge down (to shard idx+1) -> received as top halo there
    from_above = lax.ppermute(
        bot_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my top edge up (to shard idx-1) -> received as bottom halo there
    from_below = lax.ppermute(
        top_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    # zero the wrap-around at the global borders
    zeros = jnp.zeros_like(from_above)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)

    return jnp.concatenate([from_above, x, from_below], axis=-3)
