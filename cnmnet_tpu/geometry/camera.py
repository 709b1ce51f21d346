"""Camera algebra as pure jnp functions on a small pytree.

Feature parity with the reference's camera handling
(`depthnet/depth_util.py:13-56` — pixel grids, relative pose, the
``K_src R K_ref^-1 UV`` / ``K_src t`` plane-sweep terms) re-expressed as
batched closed-form linear algebra: no Python loops over the batch, no
``torch.inverse`` on 3x3/4x4 matrices (closed forms instead), so everything
traces to a handful of fused XLA ops.

Conventions
-----------
* ``extrinsic`` is the 4x4 world->camera transform ``E`` (same convention as
  the reference's camera txt files, `scannet/preprocess.py:29-46`).
* ``intrinsic`` is the 3x3 pinhole matrix ``K``.
* A packed camera array has shape ``[..., 2, 4, 4]`` with ``cam[..., 0, :, :]``
  the extrinsic and ``cam[..., 1, :3, :3]`` the intrinsic — the on-disk /
  dataloader format of the reference.
* Pixel grids are row-major ``[H, W]`` with ``u`` = column (x) and ``v`` = row
  (y); the reference flattens x-major (`depth_util.py:15`) but the math is
  order-independent, so we use the natural image layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

# Camera algebra must stay exact: TPU matmuls default to bf16 inputs, which
# injects ~2^-10 relative error into K R K^-1 and shifts warp coordinates by
# whole sub-pixels. Every contraction here pins float32 accumulation.
_F32 = lax.Precision.HIGHEST


class Camera(NamedTuple):
    """A batch of pinhole cameras.

    extrinsic: [..., 4, 4] world->camera rigid transform.
    intrinsic: [..., 3, 3] pinhole K.
    """

    extrinsic: jnp.ndarray
    intrinsic: jnp.ndarray

    @property
    def batch_shape(self):
        return self.extrinsic.shape[:-2]


def camera_from_array(cam: jnp.ndarray) -> Camera:
    """Unpack the reference's ``[..., 2, 4, 4]`` camera array."""
    return Camera(extrinsic=cam[..., 0, :, :], intrinsic=cam[..., 1, :3, :3])


def camera_to_array(camera: Camera) -> jnp.ndarray:
    """Pack a :class:`Camera` back into the ``[..., 2, 4, 4]`` array format."""
    batch = camera.extrinsic.shape[:-2]
    k44 = jnp.zeros(batch + (4, 4), camera.intrinsic.dtype)
    k44 = k44.at[..., :3, :3].set(camera.intrinsic)
    return jnp.stack([camera.extrinsic, k44], axis=-3)


def invert_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a pinhole intrinsic matrix.

    Supports the general upper-triangular K (fx, fy, cx, cy, skew s):
        K = [[fx, s, cx], [0, fy, cy], [0, 0, 1]]
    """
    fx = K[..., 0, 0]
    s = K[..., 0, 1]
    cx = K[..., 0, 2]
    fy = K[..., 1, 1]
    cy = K[..., 1, 2]
    one = jnp.ones_like(fx)
    zero = jnp.zeros_like(fx)
    inv_fx = one / fx
    inv_fy = one / fy
    row0 = jnp.stack([inv_fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], axis=-1)
    row1 = jnp.stack([zero, inv_fy, -cy / fy], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def invert_se3(E: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4 transform: inv([R t]) = [R^T, -R^T t]."""
    R = E[..., :3, :3]
    t = E[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -jnp.matmul(Rt, t, precision=_F32)], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], E.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def relative_pose(ref: Camera, src: Camera) -> jnp.ndarray:
    """Rigid transform taking ref-camera coordinates to src-camera coordinates.

    Matches the reference's ``right2left = E_src @ E_ref^-1``
    (`depth_util.py:37` — despite the name, it maps ref->src). Returns
    ``[..., 4, 4]``.
    """
    return jnp.matmul(src.extrinsic, invert_se3(ref.extrinsic), precision=_F32)


def scale_intrinsics(K: jnp.ndarray, scale_x: float, scale_y: float) -> jnp.ndarray:
    """Rescale K for a resized image (focal + principal point per axis).

    Parity with `scannet/preprocess.py:76-87`.
    """
    scale = jnp.asarray(
        [[scale_x, 1.0, scale_x], [1.0, scale_y, scale_y], [1.0, 1.0, 1.0]], K.dtype
    )
    return K * scale


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinates ``[3, H, W]``: (u, v, 1) per pixel.

    Row-major counterpart of the reference's x-major grid
    (`depth_util.py:13-21`); numerically identical per pixel.
    """
    v = jnp.arange(height, dtype=dtype)[:, None]
    u = jnp.arange(width, dtype=dtype)[None, :]
    uu = jnp.broadcast_to(u, (height, width))
    vv = jnp.broadcast_to(v, (height, width))
    ones = jnp.ones((height, width), dtype)
    return jnp.stack([uu, vv, ones], axis=0)


def plane_sweep_terms(ref: Camera, src: Camera, height: int, width: int):
    """Per-pixel homography terms for plane-sweep warping.

    For a ref-view pixel ``p = (u, v, 1)`` at depth ``d``, the homogeneous
    source-view pixel is ``K_s R K_r^-1 p * d + K_s t`` where ``[R|t]`` is the
    ref->src relative pose. Returns:

      KRKiUV: ``[..., 3, H*W]`` — ``K_s R K_r^-1 @ p`` for every pixel,
      KT:     ``[..., 3, 1]``   — ``K_s @ t``.

    Parity with `depth_util.py:24-56` minus its Python-over-batch loop: the
    translation term is a plain batched matvec here.
    """
    rel = relative_pose(ref, src)
    R = rel[..., :3, :3]
    t = rel[..., :3, 3:4]
    K_src = src.intrinsic
    K_ref_inv = invert_intrinsics(ref.intrinsic)
    KRKi = jnp.matmul(jnp.matmul(K_src, R, precision=_F32), K_ref_inv, precision=_F32)  # [..., 3, 3]
    uv = pixel_grid(height, width, KRKi.dtype).reshape(3, height * width)
    KRKiUV = jnp.matmul(KRKi, uv, precision=_F32)  # [..., 3, H*W]
    KT = jnp.matmul(K_src, t, precision=_F32)  # [..., 3, 1]
    return KRKiUV, KT
