"""Differentiable image warping in pure jnp (NHWC).

Re-implements the reference's view-synthesis stack
(`depthnet/inverse_warp.py:8-118` and the `F.grid_sample` calls at
`depthNet_model.py:220`, `inverse_warp.py:116`) TPU-first:

* Sampling happens directly in **pixel coordinates** — no [-1, 1] grid
  round-trip. The reference normalizes with ``W/2`` and relies on the
  torch-1.2-era ``grid_sample`` (align_corners=True) which lands the sample at
  ``u * (W-1) / W`` — a sub-pixel shrink toward the origin. We sample at
  exactly ``u``; this is the geometrically exact pinhole projection and the
  deviation is < 1 px at the image border (tested in
  tests/test_geometry.py).
* Out-of-frustum samples use zero padding: a neighbor tap outside
  ``[0, W-1] x [0, H-1]`` contributes 0 with its bilinear weight, matching
  torch's ``padding_mode='zeros'``.
* Gathers are expressed as one flattened ``take`` over ``H*W`` so XLA lowers a
  single vectorized gather; a Pallas version lives in
  ``cnmnet_tpu/kernels/cost_volume_pallas.py`` for the cost-volume hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_F32 = lax.Precision.HIGHEST  # see camera.py: exact f32 for geometry math

from cnmnet_tpu.geometry.camera import pixel_grid


def bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` at float pixel coordinates with zero padding.

    Args:
      image: ``[H, W, C]`` source image.
      x, y: float pixel coordinates, any matching shape ``S`` (x = column,
        y = row).

    Returns:
      ``S + [C]`` bilinearly interpolated samples; taps outside the image
      contribute zero (torch ``padding_mode='zeros'`` semantics).
    """
    H, W, C = image.shape
    out_shape = x.shape

    x = x.reshape(-1)
    y = y.reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = image.reshape(H * W, C)

    def tap(xi, yi, w):
        inside = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return vals * (w * inside.astype(image.dtype))[:, None]

    out = (
        tap(x0i, y0i, (1.0 - fx) * (1.0 - fy))
        + tap(x0i + 1, y0i, fx * (1.0 - fy))
        + tap(x0i, y0i + 1, (1.0 - fx) * fy)
        + tap(x0i + 1, y0i + 1, fx * fy)
    )
    return out.reshape(out_shape + (C,))


def bilinear_sample_dense(
    image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Exact bilinear sampling as two dense hat-weight matmuls (no gather).

    The bilinear kernel is the hat function ``max(0, 1 - |p - t|)``, which is
    nonzero for exactly the two integer taps around ``p`` — so
    ``out[q] = sum_y sum_x hat(y_q - y) hat(x_q - x) img[y, x]`` *is* the
    bilinear sample, with taps outside the image contributing zero (zeros
    padding). Expressed as ``[Q, H] @ [H, W*C]`` then a per-row dot, it runs
    on the MXU and is differentiable in the coordinates — XLA-TPU compiles
    this in seconds, whereas the equivalent scatter/gather formulation
    (``bilinear_sample``) takes minutes and executes serially on TPU.

    Cost is dense in H (Q*H*W*C MACs): right for one warp per step (the
    cross-view depth consistency loss); the 64-plane cost volume uses the
    Pallas kernel instead.

    Args / returns: same contract as :func:`bilinear_sample`.
    """
    H, W, C = image.shape
    out_shape = x.shape
    xq = x.reshape(-1)
    yq = y.reshape(-1)
    iy = jnp.arange(H, dtype=image.dtype)
    ix = jnp.arange(W, dtype=image.dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(yq[:, None] - iy[None, :]))  # [Q, H]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xq[:, None] - ix[None, :]))  # [Q, W]
    # HIGH (bf16x3 ~ f32 accuracy), not HIGHEST (bf16x6): these two MXU
    # matmuls and their VJPs were the largest non-conv spans of the train
    # step (fusion.74/71/44/46 in RESULTS.md "Backward profile" — the
    # warped-depth loss is the only train-path caller), and the hat
    # weights/depths need f32-level accuracy, not exact-f32 reproduction.
    # The position MATH (pixel2cam/cam2pixel) stays HIGHEST.
    hi = lax.Precision.HIGH
    tmp = jnp.einsum("qh,hwc->qwc", wy, image, precision=hi)
    out = jnp.einsum("qw,qwc->qc", wx, tmp, precision=hi)
    return out.reshape(out_shape + (C,))


def adaptive_bilinear_sample(image, x, y):
    """Pick the fast formulation for the current backend: dense-hat matmuls
    on TPU, flat gather elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return bilinear_sample_dense(image, x, y)
    return bilinear_sample(image, x, y)


def pixel2cam(depth: jnp.ndarray, intrinsics_inv: jnp.ndarray) -> jnp.ndarray:
    """Backproject a depth map to camera-frame 3D points.

    Args:
      depth: ``[B, H, W]``.
      intrinsics_inv: ``[B, 3, 3]``.

    Returns:
      ``[B, H, W, 3]`` points ``K^-1 (u, v, 1)^T * d``.

    Parity with `inverse_warp.py:27-43` (which returns ``[B, 3, H, W]``; we
    keep channels-last for TPU layouts).
    """
    b, h, w = depth.shape
    uv = pixel_grid(h, w, depth.dtype).reshape(3, h * w)  # [3, HW]
    rays = jnp.matmul(intrinsics_inv, uv, precision=_F32)  # [B, 3, HW]
    rays = rays.reshape(b, 3, h, w).transpose(0, 2, 3, 1)  # [B, H, W, 3]
    return rays * depth[..., None]


def cam2pixel(
    points: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    z_clamp: float = 1e-3,
):
    """Project camera-frame points of one view into another view's pixels.

    Args:
      points: ``[B, H, W, 3]`` 3D points in the reference camera frame.
      rotation: ``[B, 3, 3]`` — rows of ``K_src @ [R|t]``'s rotation block.
      translation: ``[B, 3]`` — the translation block.
      z_clamp: minimum projective depth (reference clamps at 1e-3,
        `inverse_warp.py:67`).

    Returns:
      (x, y, z): each ``[B, H, W]`` — source pixel coordinates and the
      (unclamped) projective depth of every point in the source frame.
    """
    proj = jnp.einsum(
        "bij,bhwj->bhwi", rotation, points, precision=_F32
    ) + translation[:, None, None, :]
    z = proj[..., 2]
    zc = jnp.maximum(z, z_clamp)
    x = proj[..., 0] / zc
    y = proj[..., 1] / zc
    return x, y, z


def inverse_warp(
    feat: jnp.ndarray,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    intrinsics_inv: jnp.ndarray,
):
    """Warp source-view features into the reference view given ref depth.

    Args:
      feat: ``[B, H, W, C]`` source-view features to sample.
      depth: ``[B, H, W]`` reference-view depth.
      pose: ``[B, 3, 4]`` ref->src rigid transform (rows of ``[R|t]``).
      intrinsics: ``[B, 3, 3]`` source K.
      intrinsics_inv: ``[B, 3, 3]`` inverse of reference K.

    Returns:
      (warped ``[B, H, W, C]``, src_z ``[B, H, W]``): source features
      resampled into the reference view, and each ref point's depth in the
      source camera (used by the warped-depth consistency loss).

    Parity with `inverse_warp.py:81-118`; out-of-frustum samples are zero.
    """
    points = pixel2cam(depth, intrinsics_inv)  # [B, H, W, 3]
    P = jnp.einsum("bij,bjk->bik", intrinsics, pose, precision=_F32)  # [B, 3, 4]
    x, y, z = cam2pixel(points, P[:, :, :3], P[:, :, 3])
    warped = jax.vmap(adaptive_bilinear_sample)(feat, x, y)
    return warped, z
