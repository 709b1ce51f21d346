"""Training losses — masked, vectorized, NaN-safe jnp implementations.

Parity targets (reference file:line):
* ``masked_l1``            — `depthnet/losses.py:30-48` (``IdepthLoss``)
* ``multiscale_idepth_loss``— `depthnet/losses.py:7-27` (``IdepthLoss_234``)
* ``prob_weighted_l1``     — `depthnet/losses.py:51-73` (``IdepthwithProbLoss``)
* ``surface_normal_loss``  — `depthnet/losses.py:76-122`, with the
  reference's per-sample loop reduction (`train.py:226-263`) expressed as a
  vectorized per-sample masked mean, averaged over the batch — exact
  semantics, no valid-count weighting across samples
* ``prob_supervision_loss``— reconstruction of the ``ProbLoss`` class that is
  imported at `train.py:30` but missing from the repo (SURVEY.md §2.16): from
  its call site (`train.py:197`) it returns ``(loss, prob_map_gt)`` where the
  pseudo-ground-truth confidence is derived from ``|idepth_refined - gt|``;
  we use ``exp(-w * |diff|)`` with ``w = prob_weight`` (config.yaml:12) —
  logged but excluded from the optimized loss, exactly like the reference.
* ``warped_depth_loss``    — reconstruction of
  ``fusion_depth.fuse_depth.get_warped_depth_loss`` (also missing; semantics
  from call sites `train.py:284-293`): project the refined reference depth
  into a source view and penalize L1 disagreement with that source's GT depth.

Masked means divide by ``max(count, 1)`` so empty masks yield 0 instead of
NaN (torch's masked-select + ``l1_loss`` NaNs there; under jit we must not).
"""

from __future__ import annotations

import jax.numpy as jnp

from cnmnet_tpu.geometry.warp import inverse_warp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    # where() rather than multiply: masked-out entries may be inf/NaN and
    # 0 * inf would poison the sum.
    m = mask.astype(x.dtype)
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(m), 1.0)


def valid_pair_mask(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """gt > 0, both finite, pred > 0 — the reference's L1 mask."""
    return (gt > 0.0) & jnp.isfinite(gt) & jnp.isfinite(pred) & (pred > 0.0)


def masked_l1(pred: jnp.ndarray, gt: jnp.ndarray, log: bool = False) -> jnp.ndarray:
    """Masked mean absolute error between prediction and ground truth."""
    mask = valid_pair_mask(pred, gt)
    if log:
        diff = jnp.abs(jnp.log10(jnp.where(mask, pred, 1.0)) - jnp.log10(jnp.where(mask, gt, 1.0)))
    else:
        diff = jnp.abs(pred - gt)
    return _masked_mean(diff, mask)


def _nearest_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Exact torch ``F.interpolate(mode='nearest')`` for integral factors:
    output[i] = input[factor * i], applied on the two spatial dims of NHWC."""
    return x[:, ::factor, ::factor, :]


def multiscale_idepth_loss(preds: list, gt: jnp.ndarray) -> jnp.ndarray:
    """0.1 * mean of unmasked L1 at scales 2-4.

    preds: [disp1, disp2, disp3, disp4] NHWC with spatial sizes
    (H, H/2, H/4, H/8); gt at full size. The reference uses *unmasked* means
    here (`losses.py:23-25`).
    """
    losses = []
    for i, factor in ((1, 2), (2, 4), (3, 8)):
        gt_s = _nearest_downsample(gt, factor)
        losses.append(jnp.mean(jnp.abs(preds[i] - gt_s)))
    return 0.1 * sum(losses) / 3.0


def prob_weighted_l1(
    pred: jnp.ndarray, gt: jnp.ndarray, prob_map: jnp.ndarray, log: bool = False
) -> jnp.ndarray:
    """Probability-weighted masked L1 (mean of prob * |diff| over valid)."""
    mask = valid_pair_mask(pred, gt)
    if log:
        diff = 10.0 * jnp.abs(
            jnp.log10(jnp.where(mask, pred, 1.0)) - jnp.log10(jnp.where(mask, gt, 1.0))
        )
    else:
        diff = jnp.abs(pred - gt)
    return _masked_mean(prob_map * diff, mask)


def prob_supervision_loss(
    prob_map: jnp.ndarray,
    idepth_refined: jnp.ndarray,
    gt_idepth: jnp.ndarray,
    prob_weight: float = 20.0,
):
    """Reconstructed ``ProbLoss``: supervise prob_map toward a pseudo-GT
    confidence ``exp(-prob_weight * |idepth_refined - gt|)`` on valid pixels.

    Returns (loss, prob_map_gt) like the reference call site expects.
    """
    mask = valid_pair_mask(idepth_refined, gt_idepth)
    diff = jnp.abs(idepth_refined - gt_idepth)
    prob_gt = jnp.exp(-prob_weight * diff) * mask.astype(prob_map.dtype)
    loss = _masked_mean(jnp.abs(prob_map - prob_gt), mask)
    return loss, prob_gt


def surface_normal_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    valid: jnp.ndarray,
    probability_map: jnp.ndarray | None = None,
    eps: float = 1e-8,
):
    """Cosine loss between normal maps over valid & finite pixels.

    Reduction matches the reference's per-sample loop exactly
    (`train.py:226-263` calls `losses.py:76-122` on ``[i:i+1]`` slices and
    averages the per-sample means): each sample's ``1 - cos`` is mean-reduced
    over ITS OWN valid pixels, then the per-sample means are averaged over
    the batch. A sample with zero valid pixels makes the reference's empty
    masked-select mean NaN — reproduced here as a constant-NaN ``where``
    branch (gradient-safe) so the train loop's NaN guard (`train.py:275-282`)
    fires identically.

    Args:
      pred, gt: ``[B, H, W, 3]``.
      valid: ``[B, H, W]`` bool.
      probability_map: optional ``[B, H, W]`` weights.

    Returns:
      (loss, mean_angle_degrees) — both scalars.
    """
    finite = jnp.isfinite(jnp.sum(gt, axis=-1)) & jnp.isfinite(jnp.sum(pred, axis=-1))
    mask_b = valid & finite
    mask = mask_b.astype(pred.dtype)

    # Sanitize before any arithmetic: NaN/inf gt values (the reference's
    # normals carry NaNs, `losses.py:86-88`) poison gradients even through
    # masked reductions (0-cotangent * NaN-partial = NaN), and ||.|| at a
    # zero vector has an infinite VJP.
    finite_b = finite[..., None]
    pred = jnp.where(finite_b, pred, 0.0)
    gt = jnp.where(finite_b, gt, 0.0)

    dot = jnp.sum(pred * gt, axis=-1)
    pn = jnp.sqrt(jnp.sum(jnp.square(pred), axis=-1) + eps * eps)
    gn = jnp.sqrt(jnp.sum(jnp.square(gt), axis=-1) + eps * eps)
    cos = dot / jnp.maximum(pn * gn, eps)

    count = jnp.sum(mask, axis=(1, 2))  # [B]
    safe_count = jnp.maximum(count, 1.0)
    if probability_map is None:
        per_sample = (
            jnp.sum(jnp.where(mask_b, 1.0 - cos, 0.0), axis=(1, 2)) / safe_count
        )
    else:
        w = probability_map * mask
        per_sample = jnp.sum(
            jnp.where(mask_b, (1.0 - cos) * w, 0.0), axis=(1, 2)
        ) / jnp.maximum(jnp.sum(w, axis=(1, 2)), eps)
    all_nonempty = jnp.all(count > 0)
    loss = jnp.where(all_nonempty, jnp.mean(per_sample), jnp.nan)

    ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    ang_per_sample = jnp.sum(jnp.where(mask_b, ang, 0.0), axis=(1, 2)) / safe_count
    mean_angle = (
        jnp.where(all_nonempty, jnp.mean(ang_per_sample), jnp.nan) / jnp.pi * 180.0
    )
    return loss, mean_angle


def warped_depth_loss(
    depth_refined: jnp.ndarray,
    gt_depth_src: jnp.ndarray,
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    intrinsics_inv: jnp.ndarray,
    max_depth: float = 10.0,
) -> jnp.ndarray:
    """Cross-view warped-depth consistency.

    Backproject the refined reference depth, transform into the source frame
    with ``pose`` (ref->src, ``[B, 3, 4]``), sample the source GT depth at the
    projected pixels and penalize L1 between the sampled GT and the point's
    projective depth in the source frame. Masked to in-range, in-frustum,
    in-front points.
    """
    B, H, W = depth_refined.shape
    warped_gt, src_z = inverse_warp(
        gt_depth_src[..., None], depth_refined, pose, intrinsics, intrinsics_inv
    )
    warped_gt = warped_gt[..., 0]
    mask = (
        (warped_gt > 0.0)
        & (warped_gt < max_depth)
        & (src_z > 0.0)
        & (depth_refined > 0.0)
        & (depth_refined < max_depth)
        & jnp.isfinite(src_z)
        & jnp.isfinite(warped_gt)
    )
    return _masked_mean(jnp.abs(src_z - warped_gt), mask)
