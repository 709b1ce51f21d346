"""Spatially-tiled ops under shard_map — the explicit collective path.

SURVEY.md §5 frames the cost volume / normal stencil's spatial axes as this
model's sequence-parallel analogue: the ``[B, H, W, *]`` tensors are sharded
over the mesh's "tile" axis (rows of the image), with the k x k normal
stencil satisfied by exchanging k//2 edge rows with ring neighbors over ICI
(`lax.ppermute`, see ``sharding.halo_exchange_rows``). The contract is
bit-equivalence with the unsharded op (tested on the virtual CPU mesh).

The GSPMD path (plain jit + sharding constraints) remains the default; this
module is the pinned-schedule alternative and the template for tiling more
of the pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cnmnet_tpu.geometry.camera import pixel_grid
from cnmnet_tpu.ops.normals import box_filter, solve_normal_equations
from cnmnet_tpu.parallel.sharding import halo_exchange_rows


def _local_monomials(depth, intrinsics_inv, row_offset, valid_min, valid_max):
    """Masked point monomials for a row shard, using *global* pixel rows."""
    b, h_local, w = depth.shape
    uv = pixel_grid(h_local, w, depth.dtype)
    uv = uv.at[1].add(row_offset.astype(depth.dtype))  # global v coordinate
    rays = jnp.einsum(
        "bij,jhw->bihw", intrinsics_inv, uv, precision=lax.Precision.HIGHEST
    )
    points = rays.transpose(0, 2, 3, 1) * depth[..., None]
    valid = ((depth > valid_min) & (depth < valid_max)).astype(depth.dtype)
    p = points * valid[..., None]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack([x * x, x * y, x * z, y * y, y * z, z * z, x, y, z], axis=-1)


def depth_to_normal_tiled(
    depth: jnp.ndarray,
    intrinsics_inv: jnp.ndarray,
    mesh: Mesh,
    k_size: int = 9,
    valid_min: float = 0.0,
    valid_max: float = 10.0,
    norm_eps: float = 1e-5,
) -> jnp.ndarray:
    """depth [B, H, W] (B over "data", H over "tile") -> normals [B, H, W, 3].

    Bit-equivalent to ``ops.normals.depth_to_normal`` (normals only): each
    shard computes its rows' monomials, receives k//2 halo rows from ring
    neighbors, box-filters, and solves locally.
    """
    halo = k_size // 2
    tile_n = mesh.shape["tile"]
    H = depth.shape[1]
    assert H % tile_n == 0, (H, tile_n)
    h_local = H // tile_n

    def shard_fn(depth_s, kinv_s):
        row_offset = lax.axis_index("tile") * h_local
        mono = _local_monomials(depth_s, kinv_s, row_offset, valid_min, valid_max)
        # rows axis is -3 for [B, h, W, 9]
        mono_h = halo_exchange_rows(mono, halo, axis_name="tile")
        moments = box_filter(mono_h, k_size)[:, halo:-halo]
        n = solve_normal_equations(moments)
        norm = jnp.sqrt(jnp.sum(jnp.square(n), axis=-1, keepdims=True) + 1e-20)
        return n / (norm + norm_eps)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data", "tile", None), P("data", None, None)),
        out_specs=P("data", "tile", None, None),
    )
    return fn(depth, intrinsics_inv)


def cost_volume_tiled(
    ref_images: jnp.ndarray,
    src_images: jnp.ndarray,
    KRKiUV: jnp.ndarray,
    KT: jnp.ndarray,
    idepths: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """Row-sharded cost volume: each "tile" shard computes its output rows
    against an all-gathered source image (the warp reads arbitrary source
    rows, so the source is replicated along "tile" by an all-gather that XLA
    schedules over ICI; ref rows stay local).

    ref/src: [B, H, W, C]; KRKiUV: [B, 3, H*W]; KT: [B, 3, 1];
    returns [B, H, W, P].
    """
    from cnmnet_tpu.ops.cost_volume import plane_sweep_cost_volume

    B, H, W, C = ref_images.shape
    tile_n = mesh.shape["tile"]
    assert H % tile_n == 0
    h_local = H // tile_n
    P_ = idepths.shape[0]

    # KRKiUV rows for each shard's pixels: reshape to [B, 3, H, W] and shard H.
    terms = KRKiUV.reshape(B, 3, H, W)

    def shard_fn(ref_s, src_s, terms_s, KT_s):
        src_full = lax.all_gather(src_s, "tile", axis=1, tiled=True)
        terms_flat = terms_s.reshape(terms_s.shape[0], 3, h_local * W)

        def one(r, s, t, kt):
            return plane_sweep_cost_volume(r, s, t, kt, idepths)

        return jax.vmap(one)(ref_s, src_full, terms_flat, KT_s)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P("data", "tile", None, None),
            P("data", "tile", None, None),
            P("data", None, "tile", None),
            P("data", None, None),
        ),
        out_specs=P("data", "tile", None, None),
    )
    return fn(ref_images, src_images, terms, KT)
