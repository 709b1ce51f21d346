"""DepthNet: plane-sweep hourglass regressing multi-scale inverse depth.

Architecture parity with the reference `depthNet`
(`depthnet/depthNet_model.py:124-263`):

* input: concat(ref RGB, 64-plane cost volume) = 67 channels (NHWC here);
* encoder: five stride-2 double-conv blocks 67->128->256->512->512->512 with
  kernels 7, 5, 3, 3, 3 (192x256 -> 6x8);
* decoder: bilinear-up + conv blocks with encoder skip concats, four sigmoid
  disparity heads (each scaled by ``idepth_scale``) deep-supervised by
  feeding the nearest-upsampled coarser disparity into the next iconv
  (channel arithmetic 1024/1024/513/257/65 as in the reference);
* returns ``(disps=[disp1..disp4], iconv1)`` — iconv1 is the 64-channel
  finest decoder feature handed to the refinement net.

The cost volume itself is built *outside* the module (``ops.cost_volume`` /
the Pallas kernel) so the model stays a pure dense-conv program that XLA can
lay out freely.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cnmnet_tpu.models.layers import (
    ConvNormAct,
    DispHead,
    DownConvBlock,
    UpConvBlock,
    upsample2x_nearest,
)


class DepthNet(nn.Module):
    idepth_scale: float = 3.0
    norm: str = "batch"
    dtype: Any = jnp.float32
    remat: Any = 0  # encoder stages to rematerialize in backward, counted
    # from the input side where activations are largest: 0/False = none,
    # 1-5 = that many, True = all 5. Selective values trade most of the
    # activation memory for a fraction of the re-FLOPs (stage 0 holds the
    # full-res 67-ch input + half-res 128-ch features; stages 3-4 are
    # 1/16-res and cheap to store).
    stride2: str = "conv"  # stride-2 conv impl: conv | s2d | psg (layers.py)

    @nn.compact
    def __call__(
        self, ref_image: jnp.ndarray, cost_volume: jnp.ndarray, train: bool = True
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """ref_image: [B, H, W, 3]; cost_volume: [B, H, W, P].

        Returns ([disp1, disp2, disp3, disp4], iconv1) with disp_k at 1/2^(k-1)
        resolution, each [B, h, w, 1] in inverse-depth units.
        """
        kw = dict(norm=self.norm, dtype=self.dtype)
        dkw = dict(stride2=self.stride2, **kw)
        # (rgb, volume) stays a tuple: the stem conv runs as a split
        # MultiInConv — same params/math as conv(concat(...)), but the
        # 64-plane volume keeps its 128-lane-aligned layout (the joint
        # 67-channel conv was the round-1 profile's largest op).
        x = (ref_image.astype(self.dtype), cost_volume.astype(self.dtype))

        # explicit names: nn.remat changes the auto-naming prefix, which
        # would silently re-key (and re-init) the params when toggled.
        n_remat = 5 if self.remat is True else int(self.remat)
        RematDown = nn.remat(DownConvBlock, static_argnums=(2,))

        def Down(i):
            return RematDown if i < n_remat else DownConvBlock

        conv1 = Down(0)(128, 7, **dkw, name="DownConvBlock_0")(x, train)  # 1/2
        conv2 = Down(1)(256, 5, **dkw, name="DownConvBlock_1")(conv1, train)  # 1/4
        conv3 = Down(2)(512, 3, **dkw, name="DownConvBlock_2")(conv2, train)  # 1/8
        conv4 = Down(3)(512, 3, **dkw, name="DownConvBlock_3")(conv3, train)  # 1/16
        conv5 = Down(4)(512, 3, **dkw, name="DownConvBlock_4")(conv4, train)  # 1/32

        upconv5 = UpConvBlock(512, 3, **kw)(conv5, train)  # 1/16
        iconv5 = ConvNormAct(512, 3, **kw)(
            jnp.concatenate([upconv5, conv4], axis=-1), train
        )

        upconv4 = UpConvBlock(512, 3, **kw)(iconv5, train)  # 1/8
        iconv4 = ConvNormAct(512, 3, **kw)(
            jnp.concatenate([upconv4, conv3], axis=-1), train
        )
        disp4 = DispHead(self.idepth_scale, self.dtype)(iconv4)
        udisp4 = upsample2x_nearest(disp4).astype(self.dtype)

        # The +1-channel disparity skips make these concats lane-unaligned
        # (513/257/65 ch) — feed them as tuples (split conv, exact).
        upconv3 = UpConvBlock(256, 3, **kw)(iconv4, train)  # 1/4
        iconv3 = ConvNormAct(256, 3, **kw)((upconv3, conv2, udisp4), train)
        disp3 = DispHead(self.idepth_scale, self.dtype)(iconv3)
        udisp3 = upsample2x_nearest(disp3).astype(self.dtype)

        upconv2 = UpConvBlock(128, 3, **kw)(iconv3, train)  # 1/2
        iconv2 = ConvNormAct(128, 3, **kw)((upconv2, conv1, udisp3), train)
        disp2 = DispHead(self.idepth_scale, self.dtype)(iconv2)
        udisp2 = upsample2x_nearest(disp2).astype(self.dtype)

        upconv1 = UpConvBlock(64, 3, **kw)(iconv2, train)  # 1/1
        iconv1 = ConvNormAct(64, 3, **kw)((upconv1, udisp2), train)
        disp1 = DispHead(self.idepth_scale, self.dtype)(iconv1)

        return [disp1, disp2, disp3, disp4], iconv1
