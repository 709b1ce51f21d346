"""Shared conv building blocks (flax.linen, NHWC).

Mirrors the reference's block vocabulary (`depthnet/depthNet_model.py:19-112`):
``down_conv_layer`` (conv s1 + norm + relu, conv s2 + norm + relu),
``conv_layer`` (conv s1 + norm + relu), ``up_conv_layer`` (bilinear x2 +
conv + norm + relu) and the sigmoid ``depth_layer`` head — with TPU-first
choices:

* NHWC layout, explicit symmetric (k-1)//2 padding (torch-style) so encoder
  and decoder feature maps align exactly at every skip;
* normalization is configurable: ``batch`` (reference parity; under ``jit``
  with a batch-sharded mesh the mean/var reductions become global psums, i.e.
  sync-BN comes for free from GSPMD) or ``group`` (batch-size independent);
* compute dtype is configurable (bf16 conv math on TPU, fp32 params/stats);
* init: He normal fan-out for convs (`depthNet_model.py:163-182`).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class MultiInConv(nn.Module):
    """Conv over the channel-concat of several inputs, without the concat.

    ``conv(concat(xs), W) == sum_i conv(x_i, W[:, :, off_i : off_i + c_i])``
    by linearity — exact up to fp summation order. On TPU this matters for
    the reference's unaligned concats (rgb+volume = 67 ch, decoder skips of
    128+128+1 = 257 ch, ...): the joint conv forces XLA to materialize a
    lane-misaligned buffer and pads the contraction, while the split form
    keeps each operand's native layout (measured 41% faster on the 67-ch
    stem at 192x256 B=16, tools/bench_stem.py). The parameter is the SAME
    single ``kernel`` of shape [k, k, sum(c_i), features] that nn.Conv on
    the concat would create — checkpoint trees are unchanged.
    """

    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        from jax import lax

        cin = sum(x.shape[-1] for x in xs)
        w = self.param(
            "kernel", conv_init, (self.kernel, self.kernel, cin, self.features)
        )
        p = (self.kernel - 1) // 2
        out, off = None, 0
        for x in xs:
            c = x.shape[-1]
            wi = w[:, :, off : off + c].astype(self.dtype)
            x = x.astype(self.dtype)
            dn = lax.conv_dimension_numbers(
                x.shape, wi.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = lax.conv_general_dilated(
                x, wi, (self.stride, self.stride), [(p, p), (p, p)],
                dimension_numbers=dn,
            )
            out = y if out is None else out + y
            off += c
        return out


def _phase_taps(k: int):
    """Decompose a stride-2, pad-(k-1)//2 conv into per-phase stride-1 taps.

    out[i] = sum_d x[2i + d - p] w[d] splits by the parity of o = d - p:
    taps with o = 2m + ph read phase ph of the space-to-depth transform
    (x_ph[j] = x[2j + ph]) at relative position m. Returns
    (taps=[(ph, m, d)], PL, Kp): embedding tap d at row m + PL of a common
    [Kp]-kernel with explicit padding (PL, Kp - PL - 1) reproduces the
    strided conv exactly (zero padding maps to zero padding because the
    input extent is even).
    """
    p = (k - 1) // 2
    taps = []
    for d in range(k):
        o = d - p
        ph = o % 2
        taps.append((ph, (o - ph) // 2, d))
    ms = [m for _, m, _ in taps]
    return taps, -min(ms), max(ms) - min(ms) + 1


class SpaceToDepthConv(nn.Module):
    """Exact stride-2 conv computed as space-to-depth + stride-1 conv.

    Same parameter (``kernel`` of shape [k, k, Cin, F]) and same output as
    ``nn.Conv(F, (k, k), strides=2, padding=(k-1)//2, use_bias=False)`` on
    even-extent inputs — checkpoint trees are unchanged and the flag can be
    toggled freely. Why: the *input gradient* of a strided conv lowers to a
    base-dilated convolution (the cotangent is zero-upsampled 2x2), which
    the TPU executes over the inserted zeros; the s2d form's backward is a
    dense stride-1 conv plus a reshape. The forward trades this for zeros
    embedded in the rearranged kernel (nominal FLOP factor Kp^2*4/k^2:
    1.31x at k=7, 1.44x at k=5, 1.78x at k=3), so it is a measured trade,
    not a free win — see tools/bwd_probe.py and RESULTS.md for the numbers
    that decide the default.
    """

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from jax import lax

        B, H, W, C = x.shape
        assert H % 2 == 0 and W % 2 == 0, (H, W)
        w = self.param(
            "kernel", conv_init, (self.kernel, self.kernel, C, self.features)
        )
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        taps, PL, Kp = _phase_taps(self.kernel)

        # x2[b, i, j, (phh*2 + phw)*C + c] = x[b, 2i + phh, 2j + phw, c]
        x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)

        # rearrange w into the matching [Kp, Kp, 4C, F] stride-1 kernel
        subs = []
        for phh in (0, 1):
            wh = jnp.zeros((Kp,) + w.shape[1:], w.dtype)
            for ph, m, d in taps:
                if ph == phh:
                    wh = wh.at[m + PL].set(w[d])
            for phw in (0, 1):
                whw = jnp.zeros((Kp, Kp) + w.shape[2:], w.dtype)
                for ph, m, d in taps:
                    if ph == phw:
                        whw = whw.at[:, m + PL].set(wh[:, d])
                subs.append(whw)
        w2 = jnp.stack(subs, axis=2).reshape(Kp, Kp, 4 * C, self.features)

        dn = lax.conv_dimension_numbers(x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        pad = (PL, Kp - PL - 1)
        return lax.conv_general_dilated(
            x2, w2, (1, 1), [pad, pad], dimension_numbers=dn
        )


def _grad_phase_taps(k: int, ph: int):
    """Taps of the stride-2 input gradient's phase-``ph`` stride-1 conv.

    dx[2m + ph] = sum_r ybar[m + r] w[p + ph - 2r] with p = (k-1)//2: for a
    fixed input-pixel parity the contributing kernel taps stride by 2, so
    the gradient w.r.t. that phase is a DENSE stride-1 correlation of the
    cotangent with those taps — no zero-dilated cotangent anywhere. Returns
    (ds, pad_lo, pad_hi): tap indices d in conv-kernel order and the lhs
    padding that makes ``conv(ybar, w[ds], stride 1)`` compute the sum.
    """
    p = (k - 1) // 2
    r_min = -((k - 1 - p - ph) // 2)
    r_max = (p + ph) // 2
    ds = [p + ph - 2 * r for r in range(r_min, r_max + 1)]
    return ds, -r_min, r_max


def _plain_conv_s2(x, w, k):
    from jax import lax

    p = (k - 1) // 2
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, w, (2, 2), [(p, p), (p, p)], dimension_numbers=dn
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_s2_psg(x, w, k):
    """Stride-2 conv whose input gradient is computed phase-split.

    Forward: the plain strided conv (same FLOPs, params, and output as
    ``nn.Conv(..., strides=2)``). Backward: XLA lowers a strided conv's
    input gradient to a base-dilated conv over the 2x2-zero-upsampled
    cotangent (4x nominal MACs on zeros on the MXU); here dx is instead
    four dense stride-1 convs of the cotangent with the per-parity kernel
    taps (`_grad_phase_taps`), interleaved depth-to-space — exactly the
    nominal FLOP count. dw keeps XLA's standard transpose (a
    window-strided correlation, no dilation involved). Exactness is pinned
    by tests/test_models.py; the chip numbers live in tools/bwd_probe.py
    and RESULTS.md.
    """
    return _plain_conv_s2(x, w, k)


def _psg_fwd(x, w, k):
    return _plain_conv_s2(x, w, k), (x, w)


def _psg_bwd(k, res, ybar):
    from jax import lax

    x, w = res
    B, H, W, C = x.shape
    _, vjp_w = jax.vjp(lambda ww: _plain_conv_s2(x, ww, k), w)
    (dw,) = vjp_w(ybar)

    phases = []
    for ph_h in (0, 1):
        dsh, plh, phh = _grad_phase_taps(k, ph_h)
        for ph_w in (0, 1):
            dsw, plw, phw = _grad_phase_taps(k, ph_w)
            # v[rh, rw, f, c] = w[d_h(rh), d_w(rw), c, f] — static slices
            v = jnp.stack(
                [jnp.stack([w[dh, dw_] for dw_ in dsw], 0) for dh in dsh], 0
            )
            v = jnp.transpose(v, (0, 1, 3, 2))
            dn = lax.conv_dimension_numbers(
                ybar.shape, v.shape, ("NHWC", "HWIO", "NHWC")
            )
            phases.append(
                lax.conv_general_dilated(
                    ybar, v, (1, 1), [(plh, phh), (plw, phw)],
                    dimension_numbers=dn,
                )
            )
    st = jnp.stack(phases, axis=3).reshape(B, H // 2, W // 2, 2, 2, C)
    dx = st.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    return dx, dw


conv_s2_psg.defvjp(_psg_fwd, _psg_bwd)


class PhaseSplitGradConv(nn.Module):
    """Stride-2 conv with the phase-split input gradient (`conv_s2_psg`).

    Same parameter tree and forward as the strided ``nn.Conv``; only the
    VJP differs (by value it is the same function). ``model.stride2="psg"``
    selects it throughout DepthNet/RefineNet.
    """

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        assert H % 2 == 0 and W % 2 == 0, (H, W)
        w = self.param(
            "kernel", conv_init, (self.kernel, self.kernel, C, self.features)
        )
        return conv_s2_psg(x.astype(self.dtype), w.astype(self.dtype), self.kernel)


class ConvNormAct(nn.Module):
    """conv (no bias) + norm [+ relu].

    ``x`` may be a tuple/list of NHWC tensors: they are treated as the
    channel-concat but convolved via MultiInConv (same params, faster on
    TPU for lane-unaligned concats).
    """

    features: int
    kernel: int
    stride: int = 1
    act: bool = True
    norm: str = "batch"
    dtype: Any = jnp.float32
    stride2: str = "conv"  # stride-2 impl: conv | s2d | psg (same params)

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = (self.kernel - 1) // 2
        if isinstance(x, (tuple, list)):
            x = MultiInConv(
                self.features, self.kernel, self.stride, dtype=self.dtype,
                name="Conv_0",
            )(x)
        elif self.stride == 2 and self.stride2 != "conv":
            impl = {"s2d": SpaceToDepthConv, "psg": PhaseSplitGradConv}[self.stride2]
            x = impl(
                self.features, self.kernel, dtype=self.dtype, name="Conv_0"
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                use_bias=False,
                kernel_init=conv_init,
                dtype=self.dtype,
            )(x)
        if self.norm == "batch":
            # torch BatchNorm2d parity: eps 1e-5, running-stat momentum 0.1
            # (flax `momentum` is the fraction of the *old* average = 0.9).
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        else:
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class DownConvBlock(nn.Module):
    """Two convs, the second stride-2 (`down_conv_layer`)."""

    features: int
    kernel: int
    norm: str = "batch"
    dtype: Any = jnp.float32
    stride2: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvNormAct(self.features, self.kernel, 1, norm=self.norm, dtype=self.dtype)(
            x, train
        )
        x = ConvNormAct(
            self.features, self.kernel, 2, norm=self.norm, dtype=self.dtype,
            stride2=self.stride2,
        )(x, train)
        return x


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 with half-pixel centers (torch align_corners=False).

    Implemented as an edge-padded fractionally-strided depthwise convolution
    rather than ``jax.image.resize``: numerically identical (hat weights
    0.25/0.75 with edge clamping), marginally faster on TPU, and — the real
    reason — GSPMD partitions convolutions exactly under spatial ("tile")
    sharding, whereas resize's gather lowers with ~3e-2 gradient error when
    its input is sharded (measured; see tests/test_parallel.py).
    """
    from jax import lax

    B, H, W, C = x.shape
    k = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    kv = jnp.broadcast_to(k.reshape(4, 1, 1, 1), (4, 1, 1, C))
    kh = jnp.broadcast_to(k.reshape(1, 4, 1, 1), (1, 4, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, (4, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    # Edge padding via explicit concatenate, NOT jnp.pad(mode="edge"): the
    # pad VJP lowers to a collective-permute under GSPMD even on a pure
    # batch-sharded mesh (the round-1 multichip rendezvous crash); the
    # slice+concat transpose stays local. Forward is bit-identical.
    xe = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    y = lax.conv_general_dilated(
        xe, kv, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(2, 1),
        dimension_numbers=dn, feature_group_count=C,
    )  # length 2H exactly (see weight algebra in the docstring)
    ye = jnp.concatenate([y[:, :, :1], y, y[:, :, -1:]], axis=2)
    out = lax.conv_general_dilated(
        ye, kh, (1, 1), [(0, 0), (0, 0)], lhs_dilation=(1, 2),
        dimension_numbers=dn, feature_group_count=C,
    )
    return out


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch nearest x2: out[i] = in[i // 2]."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class UpConvBlock(nn.Module):
    """Bilinear x2 upsample + conv + norm + relu (`up_conv_layer`)."""

    features: int
    kernel: int = 3
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = upsample2x_bilinear(x)
        return ConvNormAct(self.features, self.kernel, 1, norm=self.norm, dtype=self.dtype)(
            x, train
        )


class DispHead(nn.Module):
    """3x3 conv (with bias) + sigmoid, scaled by idepth_scale
    (`depth_layer` + the `self.idepth_scale *` at the call sites)."""

    scale: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            1, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            kernel_init=conv_init, dtype=self.dtype,
        )(x)
        return self.scale * nn.sigmoid(x.astype(jnp.float32))
