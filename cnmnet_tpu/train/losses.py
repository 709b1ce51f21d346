"""Loss orchestration: the reference's full multi-term training recipes.

Implements both sacred commands of the reference as one jit-able function:

* the full CNM recipe (`train.py:177-304`): disparity L1 at four scales,
  depth L1, refined losses, surface-normal losses against the Combined
  Normal Map, prob-map losses, and the two cross-view warped-depth
  consistency terms — including the reference's NaN guard that drops the
  normal terms when they go non-finite (`train.py:275-282`);
* the `train_wo_normal` recipe (`train.py:556-560`) with its 5-epoch
  disparity-only curriculum.

Curriculum / guard branches are expressed as arithmetic gates
(``jnp.where`` on scalars) so a single compiled program serves every epoch.

Sign conventions note: the inverse-depth -> depth conversions use a 1e-8
epsilon everywhere (the reference mixes no-eps / 1e-5 / 1e-8 across call
sites; one epsilon keeps the program NaN-free with no measurable effect at
idepth >= 0.02).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax.numpy as jnp

from cnmnet_tpu.geometry.camera import invert_intrinsics, invert_se3
from cnmnet_tpu.kernels import dispatch
from cnmnet_tpu.models.cnm import CNMOutputs
from cnmnet_tpu.ops.losses import (
    masked_l1,
    multiscale_idepth_loss,
    prob_supervision_loss,
    prob_weighted_l1,
    surface_normal_loss,
    warped_depth_loss,
)
from cnmnet_tpu.ops.planes import normal_by_planes

_EPS = 1e-8

# Inverse-depth -> depth floor. The reference divides 1/idepth with no (or
# tiny) epsilon (`train.py:185-188`); at init the sigmoid heads underflow on
# some pixels, making depth terms ~1e7 and their gradients overflow to NaN.
# Clipping idepth at 0.01 (100 m) bounds the depth losses without touching
# the valid working range [0.02, 3.0] m^-1; gradients below the floor flow
# through the disparity losses instead.
_IDEPTH_FLOOR = 1e-2


def _to_depth(idepth: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.maximum(idepth, _IDEPTH_FLOOR)


@dataclass(frozen=True)
class LossWeights:
    use_normal_loss: bool = True  # False -> the train_wo_normal recipe
    use_normal_refined_by_planes: bool = True  # CNM target vs raw GT normals
    curriculum_epochs: int = 5  # train_wo_normal: disparity-only warmup
    prob_weight: float = 20.0
    include_prob_map_loss: bool = False
    k_size: int = 9


def compute_losses(
    out: CNMOutputs,
    batch: Dict[str, jnp.ndarray],
    epoch: jnp.ndarray,
    w: LossWeights,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch keys (all NHWC):
    images [B,V,H,W,3], cams [B,V,2,4,4], depths [B,V,H,W],
    disparity [B,H,W] (ref), normals [B,H,W,3] (ref GT),
    instance_segs [B,S,H,W], planes_num [B].
    """
    gt_disp = batch["disparity"][..., None]  # [B,H,W,1]
    gt_depth_ref = batch["depths"][:, 0][..., None]  # [B,H,W,1]

    idepth01 = out.disps[0][:, 0]  # [B,H,W,1]
    idepth02 = out.disps[0][:, 1]
    has_refiner = out.idepth_refined is not None

    # --- disparity losses -------------------------------------------------
    loss_idepth_1 = 0.5 * (masked_l1(idepth01, gt_disp) + masked_l1(idepth02, gt_disp))
    loss_idepth_234 = 0.5 * (
        multiscale_idepth_loss([d[:, 0] for d in out.disps], gt_disp)
        + multiscale_idepth_loss([d[:, 1] for d in out.disps], gt_disp)
    )

    # --- depth losses -----------------------------------------------------
    depth01 = _to_depth(idepth01)
    depth02 = _to_depth(idepth02)
    loss_depth_1 = 0.5 * (
        masked_l1(depth01, gt_depth_ref) + masked_l1(depth02, gt_depth_ref)
    )

    metrics = {
        "loss_idepth": loss_idepth_1,
        "loss_idepth_234": loss_idepth_234,
        "loss_depth": loss_depth_1,
    }

    if has_refiner:
        idepth_refined = out.idepth_refined
        prob_map = out.prob_map
        depth_refined = _to_depth(idepth_refined)
        loss_idepth_refined = masked_l1(idepth_refined, gt_disp)
        loss_depth_refined = masked_l1(depth_refined, gt_depth_ref)

        prob_loss_depth = prob_weighted_l1(idepth_refined, gt_disp, prob_map) + (
            prob_weighted_l1(depth_refined, gt_depth_ref, prob_map)
        )
        prob_loss_minusmean = 1.0 - jnp.mean(prob_map)
        prob_map_loss, prob_map_gt = prob_supervision_loss(
            prob_map, idepth_refined, gt_disp, w.prob_weight
        )
        prob_loss = 5.0 * prob_loss_depth + prob_loss_minusmean
        if w.include_prob_map_loss:
            prob_loss = prob_loss + prob_map_loss
        metrics.update(
            {
                "loss_idepth_refined": loss_idepth_refined,
                "loss_depth_refined": loss_depth_refined,
                "prob_loss": prob_loss,
                "prob_loss_depth": prob_loss_depth,
                "prob_loss_minusmean": prob_loss_minusmean,
                "prob_map_loss": prob_map_loss,
            }
        )
    else:
        # DepthNet-only staged pretraining (the reference's disparity
        # checkpoint): no refined/prob terms.
        zero = jnp.zeros_like(loss_idepth_1)
        idepth_refined = idepth01
        depth_refined = depth01
        loss_idepth_refined = zero
        loss_depth_refined = zero
        prob_loss = zero

    if not w.use_normal_loss:
        # `train_wo_normal` (`train.py:556-560`): 5-epoch disparity-only
        # curriculum, then add depth + prob terms.
        primary = loss_idepth_1 + loss_idepth_234 + loss_idepth_refined
        secondary = loss_depth_1 + loss_depth_refined + prob_loss
        gate = (epoch >= w.curriculum_epochs).astype(primary.dtype)
        loss_train = primary + gate * secondary
        metrics["loss"] = loss_train
        return loss_train, metrics

    # --- normal losses (full CNM recipe) ---------------------------------
    K = batch["cams"][:, 0, 1, 0:3, 0:3]
    K_inv = invert_intrinsics(K)
    n01, _ = dispatch.depth_to_normal(depth01[..., 0], K_inv, w.k_size)
    n02, _ = dispatch.depth_to_normal(depth02[..., 0], K_inv, w.k_size)
    n_ref, _ = dispatch.depth_to_normal(depth_refined[..., 0], K_inv, w.k_size)

    gt_normal = batch["normals"]
    if w.use_normal_refined_by_planes:
        target_normal = normal_by_planes(
            gt_normal, batch["instance_segs"], batch["planes_num"]
        )
    else:
        target_normal = gt_normal
    valid = batch["depths"][:, 0] > 0.1

    ln01, ang01 = surface_normal_loss(n01, target_normal, valid)
    ln02, ang02 = surface_normal_loss(n02, target_normal, valid)
    ln_ref, ang_ref = surface_normal_loss(n_ref, target_normal, valid)
    loss_normal_depth = 0.5 * (ln01 + ln02)
    loss_normal_depth_refined = ln_ref
    mean_angle = (ang01 + ang02 + ang_ref) / 3.0

    # --- warped-depth consistency (`train.py:284-293`) --------------------
    ref_E = batch["cams"][:, 0, 0]
    ref_E_inv = invert_se3(ref_E)
    dref = depth_refined[..., 0]
    warped_losses = []
    for v in (1, 2):
        src_E = batch["cams"][:, v, 0]
        pose = jnp.matmul(src_E, ref_E_inv)[:, :3, :]
        warped_losses.append(
            warped_depth_loss(dref, batch["depths"][:, v], pose, K, K_inv)
        )
    warped_1, warped_2 = warped_losses

    # --- total with the reference's NaN guard ------------------------------
    base = loss_idepth_1 + loss_depth_1 + loss_depth_refined + loss_idepth_refined
    normal_terms = loss_normal_depth + loss_normal_depth_refined + prob_loss
    normals_ok = jnp.isfinite(loss_normal_depth) & jnp.isfinite(
        loss_normal_depth_refined
    )
    loss_train = base + jnp.where(normals_ok, normal_terms, 0.0)
    loss_train = loss_train + warped_1 + warped_2

    metrics.update(
        {
            "loss": loss_train,
            "loss_normal_depth": loss_normal_depth,
            "loss_normal_depth_refined": loss_normal_depth_refined,
            "mean_normal_angle_deg": mean_angle,
            "warped_depth_loss_1": warped_1,
            "warped_depth_loss_2": warped_2,
        }
    )
    return loss_train, metrics
