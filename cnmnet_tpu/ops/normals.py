"""Depth -> surface normal via k x k least-squares plane fits — jnp reference.

Semantics parity with the reference's ``Depth2normal``
(`depthnet/depth_util.py:140-240`): backproject depth to camera-frame points,
fit a plane ``n . p = 1`` to every pixel's k x k neighborhood (masking
invalid depths, zero-padding at borders), solve the 3x3 normal equations
``(A^T A) n = A^T 1``, substitute identity for singular systems
(det < 1e-5 or NaN), and L2-normalize.

TPU-first design — the whole point of this module: the reference
materializes an ``[B, H, W, k^2, 3]`` unfold tensor (81x HBM amplification at
k=9) and runs batched ``det``/``inverse``/``bmm`` over B*H*W little systems.
Here the normal equations are assembled as **nine separable k x k box-filter
sums** of per-pixel monomials (xx, xy, xz, yy, yz, zz, x, y, z of the masked
points) and the 3x3 solve is the closed-form adjugate — everything is
elementwise math plus two thin depthwise convolutions, which XLA fuses and
tiles; no gather, no unfold, no batched matrix inverse. The Pallas kernel in
``kernels/normals_pallas.py`` additionally fuses the stencil accumulation
with the solve inside VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from cnmnet_tpu.geometry.warp import pixel2cam


def _box_filter_impl(x: jnp.ndarray, k_size: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    pad = k_size // 2
    ones_v = jnp.ones((k_size, 1, 1, 1), x.dtype)
    ones_h = jnp.ones((1, k_size, 1, 1), x.dtype)
    dn = lax.conv_dimension_numbers(x.shape, (k_size, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    kern_v = jnp.broadcast_to(ones_v, (k_size, 1, 1, C))
    kern_h = jnp.broadcast_to(ones_h, (1, k_size, 1, C))
    y = lax.conv_general_dilated(
        x, kern_v, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=C, precision=lax.Precision.HIGHEST,
    )
    y = lax.conv_general_dilated(
        y, kern_h, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=C, precision=lax.Precision.HIGHEST,
    )
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def box_filter(x: jnp.ndarray, k_size: int) -> jnp.ndarray:
    """Separable k x k box sum with zero padding, NHWC.

    Equivalent to correlating with a k x k kernel of ones (the unfold-sum of
    the reference), done as two depthwise 1-D convolutions.

    Custom VJP: the zero-padded box sum is **self-adjoint** (|i-j| <= pad is
    symmetric, the two 1-D passes commute), so the backward pass is the same
    box filter applied to the cotangent — mathematically identical to the
    autodiff gradient but lowered as the cheap forward-style conv instead of
    XLA's generic transposed-conv (the two `transpose(jvp())` convs were
    ~1.8 ms of the 54 ms train step on v5e).
    """
    return _box_filter_impl(x, k_size)


def _box_filter_fwd(x, k_size):
    return _box_filter_impl(x, k_size), None


def _box_filter_bwd(k_size, _res, g):
    return (_box_filter_impl(g, k_size),)


box_filter.defvjp(_box_filter_fwd, _box_filter_bwd)


def solve_normal_equations(moments: jnp.ndarray, det_eps: float = 1e-5) -> jnp.ndarray:
    """Closed-form solve of ``(A^T A) n = A^T 1`` from accumulated moments.

    Args:
      moments: ``[..., 9]`` = (Sxx, Sxy, Sxz, Syy, Syz, Szz, Sx, Sy, Sz) —
        windowed sums of masked point monomials.

    Returns:
      ``[..., 3]`` unnormalized plane normals. Singular systems
      (det < det_eps or NaN, the reference's identity-substitution branch at
      `depth_util.py:185-198`) fall back to ``n = A^T 1``.
    """
    a, b, c, d, e, f = (moments[..., i] for i in range(6))
    rx, ry, rz = (moments[..., i] for i in range(6, 9))

    det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)

    adj00 = d * f - e * e
    adj01 = c * e - b * f
    adj02 = b * e - c * d
    adj11 = a * f - c * c
    adj12 = b * c - a * e
    adj22 = a * d - b * b

    nx = adj00 * rx + adj01 * ry + adj02 * rz
    ny = adj01 * rx + adj11 * ry + adj12 * rz
    nz = adj02 * rx + adj12 * ry + adj22 * rz

    singular = jnp.isnan(det) | (det < det_eps)
    safe_det = jnp.where(singular, jnp.ones_like(det), det)
    inv_det = 1.0 / safe_det

    nx = jnp.where(singular, rx, nx * inv_det)
    ny = jnp.where(singular, ry, ny * inv_det)
    nz = jnp.where(singular, rz, nz * inv_det)
    return jnp.stack([nx, ny, nz], axis=-1)


def depth_to_normal(
    depth: jnp.ndarray,
    intrinsics_inv: jnp.ndarray,
    k_size: int = 9,
    valid_min: float = 0.0,
    valid_max: float = 10.0,
    norm_eps: float = 1e-5,
):
    """Per-pixel least-squares surface normals from a depth map.

    Args:
      depth: ``[B, H, W]``.
      intrinsics_inv: ``[B, 3, 3]``.
      k_size: stencil size (reference default 9 -> 81-point fits).

    Returns:
      (normals ``[B, H, W, 3]``, points ``[B, H, W, 3]``): unit normals (L2
      with +1e-5 on the norm, matching `depth_util.py:201`) and the
      backprojected camera-frame points.
    """
    points = pixel2cam(depth, intrinsics_inv)  # [B, H, W, 3]
    valid = ((depth > valid_min) & (depth < valid_max)).astype(depth.dtype)
    p = points * valid[..., None]

    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    monomials = jnp.stack(
        [x * x, x * y, x * z, y * y, y * z, z * z, x, y, z], axis=-1
    )  # [B, H, W, 9]
    moments = box_filter(monomials, k_size)
    n = solve_normal_equations(moments)
    # Safe norm: at fully-invalid pixels n == 0 and d||n||/dn is NaN; the tiny
    # bias keeps the VJP finite without moving any non-degenerate value.
    norm = jnp.sqrt(jnp.sum(jnp.square(n), axis=-1, keepdims=True) + 1e-20)
    n = n / (norm + norm_eps)
    return n, points


def normal_mean_angle_deg(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray):
    """Mean angular error (degrees) between normal maps over valid pixels.

    The golden-value check generalizing the reference's
    `data_prepare/check_gt_normal.py`.
    """
    cos = jnp.sum(pred * gt, axis=-1) / (
        jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(gt, axis=-1) + 1e-8
    )
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    w = valid.astype(pred.dtype)
    return jnp.sum(ang * w) / jnp.maximum(jnp.sum(w), 1.0)
