"""CNMModel: the full multi-view depth pipeline as one flax module.

Wires cost-volume construction + DepthNet + DepthRefineNet into a single
parameter tree and a single jit-able forward covering every protocol of the
reference:

* 3-view training (`train.py:164-175`): two (ref, src) DepthNet passes fused
  into one folded batch of 2B (better BN statistics and one big conv program
  instead of two), then refinement;
* 2-view eval (`eval.py:260`): S=1, no refinement;
* 5-/7-view eval (`eval.py:635-663, 885-929`): S sources folded into the
  batch, per-group averaging of disparities/iconv features (even-index
  sources form group 1, odd-index group 2 — the reference's pairing of
  [+10, -10, +5, -5(, +20, -20)]), then refinement.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional

import jax.numpy as jnp
from flax import linen as nn

from cnmnet_tpu.geometry.camera import camera_from_array
from cnmnet_tpu.kernels import dispatch
from cnmnet_tpu.models.depthnet import DepthNet
from cnmnet_tpu.models.refinenet import DepthRefineNet


class CNMOutputs(NamedTuple):
    """disps: 4 scales, each [B, S, h, w, 1] per source pair;
    iconv: [B, S, H, W, 64];
    idepth_g1/g2: the group-averaged full-res disparities fed to the refiner
    (None when S == 1);
    idepth_refined, prob_map: [B, H, W, 1] (None when S == 1)."""

    disps: List[jnp.ndarray]
    iconv: jnp.ndarray
    idepth_g1: Optional[jnp.ndarray]
    idepth_g2: Optional[jnp.ndarray]
    idepth_refined: Optional[jnp.ndarray]
    prob_map: Optional[jnp.ndarray]


class CNMModel(nn.Module):
    idepth_scale: float = 3.0
    num_planes: int = 64
    norm: str = "batch"
    dtype: Any = jnp.float32
    cv_backend: Optional[str] = None  # kernel dispatch override
    sampling: str = "exact"  # "torch" reproduces the reference's era
    # grid_sample convention (u*(S-1)/S) for imported-checkpoint parity
    use_refiner: bool = True  # False: DepthNet-only (the reference's staged
    # pretraining; its published checkpoint is a disparity-only DepthNet)
    remat: Any = 0  # DepthNet encoder stages to rematerialize (see
    # DepthNet.remat): 0/False = none, 1-5 = from the input side, True = 5
    remat_refiner: bool = False  # rematerialize the RefineNet too (its
    # native-res activations are what OOM the batch-4 480x640 step)
    stride2: str = "conv"  # stride-2 conv impl: conv | s2d | psg (same
    # params; backward-pass trades measured in tools/bwd_probe.py)

    def setup(self):
        self.depth_net = DepthNet(
            idepth_scale=self.idepth_scale, norm=self.norm, dtype=self.dtype,
            remat=self.remat, stride2=self.stride2,
        )
        self.refine_net = DepthRefineNet(
            idepth_scale=self.idepth_scale, norm=self.norm, dtype=self.dtype,
            stride2=self.stride2, remat=self.remat_refiner,
        )

    def __call__(
        self, images: jnp.ndarray, cams: jnp.ndarray, train: bool = True
    ) -> CNMOutputs:
        """images: [B, V, H, W, 3] (view 0 = reference); cams: [B, V, 2, 4, 4]."""
        B, V, H, W, C = images.shape
        S = V - 1
        assert S >= 1, "need at least one source view"

        ref = images[:, 0]
        ref_cam_arr = cams[:, 0]

        # Fold sources into the batch: pair i of sample b sits at b * S + i.
        src = images[:, 1:].reshape(B * S, H, W, C)
        src_cam_arr = cams[:, 1:].reshape(B * S, 2, 4, 4)
        ref_rep = jnp.repeat(ref, S, axis=0)
        ref_cam_rep = jnp.repeat(ref_cam_arr, S, axis=0)

        volume = dispatch.cost_volume(
            ref_rep,
            src,
            camera_from_array(ref_cam_rep),
            camera_from_array(src_cam_arr),
            idepth_scale=self.idepth_scale,
            num_planes=self.num_planes,
            backend=self.cv_backend,
            sampling=self.sampling,
            out_dtype=self.dtype,
        )

        disps, iconv = self.depth_net(ref_rep, volume, train=train)

        disps_unfold = [
            d.reshape(B, S, d.shape[1], d.shape[2], 1) for d in disps
        ]
        iconv_unfold = iconv.reshape(B, S, H, W, iconv.shape[-1])

        if S == 1 or not self.use_refiner:
            return CNMOutputs(disps_unfold, iconv_unfold, None, None, None, None)

        # Group-average: even-index sources -> hypothesis 1, odd -> hypothesis 2.
        d1 = disps_unfold[0]
        idepth_g1 = jnp.mean(d1[:, 0::2], axis=1)
        idepth_g2 = jnp.mean(d1[:, 1::2], axis=1)
        iconv_g1 = jnp.mean(iconv_unfold[:, 0::2], axis=1)
        iconv_g2 = jnp.mean(iconv_unfold[:, 1::2], axis=1)

        idepth_refined, prob_map = self.refine_net(
            idepth_g1, idepth_g2, iconv_g1, iconv_g2, train=train
        )
        return CNMOutputs(
            disps_unfold, iconv_unfold, idepth_g1, idepth_g2, idepth_refined, prob_map
        )
