"""DepthRefineNet: occlusion-aware fusion of two inverse-depth hypotheses.

Architecture parity with the reference ``DepthRefineNet``
(`depthnet/depthNet_model.py:268-370`):

* input: concat(idepth01, idepth02, |idepth01 - idepth02|, iconv01 + iconv02)
  = 67 channels;
* shared 3-block stride-2 encoder 67->128->256->512;
* two decoder branches with encoder skips (512/256 concats): one ends in a
  sigmoid disparity head scaled by ``idepth_scale`` (the refined inverse
  depth), the other in a sigmoid probability head (the occlusion-confidence
  map);
* optionally also returns the last depth-branch feature (``ReturnVolume``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from cnmnet_tpu.models.layers import ConvNormAct, DispHead, DownConvBlock, UpConvBlock


class _DecoderBranch(nn.Module):
    norm: str
    dtype: Any
    head_scale: float  # sigmoid scale (idepth_scale for depth, 1.0 for prob)

    @nn.compact
    def __call__(self, conv1, conv2, conv3, train: bool = True):
        kw = dict(norm=self.norm, dtype=self.dtype)
        upconv3 = UpConvBlock(256, 3, **kw)(conv3, train)
        iconv3 = ConvNormAct(256, 3, **kw)(
            jnp.concatenate([upconv3, conv2], axis=-1), train
        )
        upconv2 = UpConvBlock(128, 3, **kw)(iconv3, train)
        iconv2 = ConvNormAct(128, 3, **kw)(
            jnp.concatenate([upconv2, conv1], axis=-1), train
        )
        upconv1 = UpConvBlock(64, 3, **kw)(iconv2, train)
        iconv1 = ConvNormAct(64, 3, **kw)(upconv1, train)
        out = DispHead(self.head_scale, self.dtype)(iconv1)
        return out, iconv1


class DepthRefineNet(nn.Module):
    idepth_scale: float = 3.0
    norm: str = "batch"
    dtype: Any = jnp.float32
    stride2: str = "conv"  # stride-2 conv impl: conv | s2d | psg (layers.py)
    remat: bool = False  # rematerialize encoder blocks + decoder branches
    # in backward (memory for re-FLOPs; exactness pinned in test_train.py —
    # explicit names below keep the param tree independent of the flag)

    @nn.compact
    def __call__(
        self,
        idepth01: jnp.ndarray,
        idepth02: jnp.ndarray,
        iconv01: jnp.ndarray,
        iconv02: jnp.ndarray,
        train: bool = True,
        return_volume: bool = False,
    ):
        """All inputs NHWC: idepth* [B, H, W, 1], iconv* [B, H, W, 64]."""
        diff = jnp.abs(idepth01 - idepth02)
        # Tuple input = split conv on the 1+1+1+64 = 67-ch unaligned concat
        # (see layers.MultiInConv; params/math identical to the concat form).
        x = tuple(
            t.astype(self.dtype)
            for t in (idepth01, idepth02, diff, iconv01 + iconv02)
        )

        kw = dict(norm=self.norm, dtype=self.dtype)
        dkw = dict(stride2=self.stride2, **kw)
        Down = (
            nn.remat(DownConvBlock, static_argnums=(2,))
            if self.remat else DownConvBlock
        )
        Branch = (
            nn.remat(_DecoderBranch, static_argnums=(4,))
            if self.remat else _DecoderBranch
        )
        conv1 = Down(128, 3, **dkw, name="DownConvBlock_0")(x, train)
        conv2 = Down(256, 3, **dkw, name="DownConvBlock_1")(conv1, train)
        conv3 = Down(512, 3, **dkw, name="DownConvBlock_2")(conv2, train)

        disp_refined, iconv1_depth = Branch(
            self.norm, self.dtype, self.idepth_scale, name="depth_branch"
        )(conv1, conv2, conv3, train)
        prob_map, _ = Branch(
            self.norm, self.dtype, 1.0, name="prob_branch"
        )(conv1, conv2, conv3, train)

        if return_volume:
            return disp_refined, prob_map, iconv1_depth
        return disp_refined, prob_map
