"""Kernel backend dispatch: jnp reference impls vs Pallas TPU kernels.

Every hot op has two interchangeable implementations:

* ``jnp``   — the pure-jnp reference in ``cnmnet_tpu/ops`` (source of truth
  for tests, CPU fallback, and autodiff);
* ``pallas`` — the fused TPU kernel in ``cnmnet_tpu/kernels`` (bit-tolerance
  tested against the jnp impl).

The active backend defaults to ``pallas`` on TPU and ``jnp`` elsewhere, and
can be forced globally (``set_backend``) or per call (``backend=`` kwarg).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cnmnet_tpu.ops import cost_volume as _cv_ops
from cnmnet_tpu.ops import normals as _normal_ops

_FORCED: str | None = None


@functools.cache
def _default_backend() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no devices at all
        platform = "cpu"
    return "pallas" if platform in ("tpu", "axon") else "jnp"


def get_backend() -> str:
    return _FORCED or _default_backend()


def set_backend(name: str | None) -> None:
    """Force a backend globally ('jnp' | 'pallas' | None to auto-select)."""
    global _FORCED
    if name not in (None, "jnp", "pallas"):
        raise ValueError(f"unknown backend {name!r}")
    _FORCED = name


def cost_volume(ref_images, src_images, ref_cam, src_cam, idepth_scale=3.0,
                num_planes=64, backend=None, sampling="exact"):
    """Batched plane-sweep cost volume ``[B, H, W, P]`` (see ops.cost_volume).

    sampling: "exact" samples the source at the true pinhole projection u;
    "torch" reproduces the reference's torch-1.2-era grid_sample
    (align_corners=True after /(S/2) normalization, `depthNet_model.py:214-220`),
    which lands at u*(S-1)/S — use it when evaluating imported reference
    checkpoints. Implemented by pre-scaling the source intrinsics (identical
    math, works for every backend).
    """
    if sampling == "torch":
        H, W = ref_images.shape[1], ref_images.shape[2]
        s = jnp.asarray(
            [(W - 1) / W, (H - 1) / H, 1.0], ref_images.dtype
        )[:, None]
        src_cam = src_cam._replace(intrinsic=src_cam.intrinsic * s)
    elif sampling != "exact":
        raise ValueError(f"unknown sampling convention {sampling!r}")
    b = backend or get_backend()
    if b == "pallas":
        try:
            from cnmnet_tpu.kernels.cost_volume_pallas import (
                cost_volume_pallas,
            )

            return cost_volume_pallas(
                ref_images, src_images, ref_cam, src_cam, idepth_scale, num_planes
            )
        except ImportError:
            pass
    return _cv_ops.cost_volume_from_cameras(
        ref_images, src_images, ref_cam, src_cam, idepth_scale, num_planes
    )


def depth_to_normal(depth, intrinsics_inv, k_size=9, backend=None):
    """Depth -> unit normals ``[B, H, W, 3]`` (+ points; see ops.normals)."""
    b = backend or get_backend()
    if b == "pallas":
        try:
            from cnmnet_tpu.kernels.normals_pallas import depth_to_normal_pallas

            return depth_to_normal_pallas(depth, intrinsics_inv, k_size)
        except ImportError:
            pass
    return _normal_ops.depth_to_normal(depth, intrinsics_inv, k_size)
