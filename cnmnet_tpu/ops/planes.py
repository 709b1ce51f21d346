"""Plane-instance (CNM) ops — fixed-slot, jit-compatible segment math.

The reference handles per-image plane instances with Python double loops
(`depthnet/depth_util.py:205-238, 243-278`): for each of up to 20 PlaneRCNN
plane instances, replace the normals inside the instance mask with the
instance's mean normal — producing the "Combined Normal Map" (raw normals on
curved regions, plane-averaged normals on planar regions).

Because the instance masks of one image are mutually disjoint (they come from
a single label map), the sequential in-place update is equivalent to one
parallel masked update, which is how we express it: a single einsum over a
fixed ``[B, S, H, W]`` mask tensor (S = 20 slots; unused slots are all-zero),
so the whole op is two matmuls and stays inside ``jit`` with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_F32 = lax.Precision.HIGHEST  # segment sums must not round to bf16 on TPU


def _slot_mask(instance_segs: jnp.ndarray, planes_num: jnp.ndarray) -> jnp.ndarray:
    """Zero out slots >= planes_num. instance_segs: [B, S, H, W] (0/1)."""
    B, S = instance_segs.shape[0], instance_segs.shape[1]
    slot_ids = jnp.arange(S)[None, :]  # [1, S]
    active = (slot_ids < planes_num[:, None]).astype(instance_segs.dtype)
    return instance_segs * active[:, :, None, None]


def plane_average_normals(
    normals: jnp.ndarray,
    instance_segs: jnp.ndarray,
    planes_num: jnp.ndarray,
    eps: float = 1e-12,
):
    """Per-instance mean normals and the composited map.

    Args:
      normals: ``[B, H, W, 3]``.
      instance_segs: ``[B, S, H, W]`` binary instance masks (disjoint).
      planes_num: ``[B]`` int, number of live slots per image.

    Returns:
      (combined ``[B, H, W, 3]``, means ``[B, S, 3]``, masks ``[B, S, H, W]``):
      the Combined Normal Map (instance pixels replaced by instance means,
      others untouched), the raw per-slot means, and the slot-gated masks.
    """
    m = _slot_mask(instance_segs.astype(normals.dtype), planes_num)
    # Per-slot sums and counts: [B, S, 3], [B, S]
    sums = jnp.einsum("bshw,bhwc->bsc", m, normals, precision=_F32)
    counts = jnp.einsum("bshw->bs", m)
    means = sums / jnp.maximum(counts, eps)[..., None]
    # Composite: disjoint masks -> sum of per-slot contributions.
    inside = jnp.einsum("bshw,bsc->bhwc", m, means, precision=_F32)
    covered = jnp.clip(jnp.einsum("bshw->bhw", m), 0.0, 1.0)[..., None]
    combined = inside + normals * (1.0 - covered)
    return combined, means, m


def normal_by_planes(
    gt_normal: jnp.ndarray, instance_segs: jnp.ndarray, planes_num: jnp.ndarray
) -> jnp.ndarray:
    """The Combined Normal Map constructor.

    Parity with `depth_util.py:243-278` (``get_normal_by_planes``), minus the
    Python loops. gt_normal: ``[B, H, W, 3]`` -> ``[B, H, W, 3]``.
    """
    combined, _, _ = plane_average_normals(gt_normal, instance_segs, planes_num)
    return combined


def plane_consistency_loss(
    normals: jnp.ndarray,
    instance_segs: jnp.ndarray,
    planes_num: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Within-plane normal consistency: mean (1 - cos) per instance, summed.

    The reference's plane-regularization branch of ``Depth2normal``
    (`depth_util.py:205-238`) computes, per instance, the cosine between the
    broadcast instance-mean normal and the instance-masked normal map averaged
    over **all** pixels (out-of-mask pixels compare against a zero vector,
    contributing 1 - 0 = 1 each). That makes the loss mostly a constant
    offset; we keep the informative part only — the mean over *instance*
    pixels of ``1 - cos(mean_normal, normal)`` — which is the documented
    intent, and note the deviation here for the parity audit. (The branch is
    unused by the reference's shipped training loops.)
    """
    combined, means, m = plane_average_normals(normals, instance_segs, planes_num)
    del combined
    # cos between each pixel's normal and its slot mean, per slot.
    def _safe_unit(v):
        return v / jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True) + eps)

    mean_unit = _safe_unit(means)
    n_unit = _safe_unit(normals)
    cos = jnp.einsum("bsc,bhwc->bshw", mean_unit, n_unit, precision=_F32)
    per_slot = jnp.einsum("bshw,bshw->bs", m, 1.0 - cos, precision=_F32) / jnp.maximum(
        jnp.einsum("bshw->bs", m), 1.0
    )
    return jnp.sum(per_slot, axis=-1)  # [B]
