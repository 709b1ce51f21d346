"""Depth -> surface normals as a fused Pallas TPU kernel.

**STATUS: demoted reference artifact (round 3).** On v5e the jnp conv
formulation in `ops/normals.py` wins at every batch size (0.10 ms vs this
kernel's 1.38 ms at B=16, 192x256/k9 — the unaligned stencil shifts pay
sublane/lane relayouts that dominate once XLA batches the depthwise convs
onto the MXU; tools/bench_normals.py has the table). `kernels/dispatch.py`
therefore never routes here; the module remains importable, correctness-
tested against an f64 oracle (tests/test_pallas_kernels.py), and documented
as the worked example of a fused stencil+solve VMEM kernel with a
custom-VJP pairing.

Same math as the jnp reference (`ops/normals.py`, itself the TPU-first
rework of the reference's ``Depth2normal``, `depthnet/depth_util.py:140-240`):
backproject depth, accumulate the nine k x k windowed monomial sums
(Sxx..Sz), solve the 3x3 normal equations by closed-form adjugate, and
L2-normalize — but everything happens inside VMEM in one pass:

* the jnp version round-trips a ``[B, H, W, 9]`` monomial tensor and a
  ``[B, H, W, 9]`` moment tensor through HBM between two depthwise convs;
  the kernel reads depth once and writes normals once (9 f32 image
  round-trips saved per call, and the op runs 3x per training step);
* the box filter is separable static shifts: per monomial, a zero-padded
  ``[RB + k - 1, W]`` scratch is summed over k sublane offsets, then a
  ``[RB, W + k - 1]`` scratch over k lane offsets;
* rows are processed in blocks of ``RB`` with a halo of ``k//2`` rows copied
  from the full-depth VMEM block; image borders zero-pad exactly like the
  reference's unfold.

Grid: ``(B, H // RB)``. Shape contract (same as the cost-volume kernel):
``W % 128 == 0``, ``H % 8 == 0``; ``k`` odd. Output ``[B, 3, H, W]`` is
transposed to NHWC outside.

The training loss differentiates through depth->normal, so the kernel
carries a ``jax.custom_vjp`` whose backward is the VJP of the jnp reference
implementation (forward = fused kernel, backward = jnp autodiff — the two
forwards agree to fp tolerance, tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnmnet_tpu.geometry.warp import pixel2cam


def _row_block(H: int, cap: int = 64) -> int:
    """Largest multiple of 8 that divides H, at most ``cap``."""
    rb = min(cap, H)
    while rb >= 8:
        if H % rb == 0 and rb % 8 == 0:
            return rb
        rb -= 8
    return H  # H < 8: single block (still fine in interpret mode)


def _make_kernel(H, W, RB, pad, valid_min, valid_max, norm_eps, det_eps):
    # The halo is a full 8 sublanes (>= pad for k <= 17) so every window
    # start (rb*RB - 8, with RB % 8 == 0) is 8-aligned — Mosaic requires
    # sublane loads at provable multiples of 8.
    HALO = 8
    WINH = RB + 2 * HALO
    nb = H // RB
    k = 2 * pad + 1
    assert pad <= HALO, (pad, HALO)

    def kernel(kinv_ref, depth_ref, out_ref):
        i00, i01, i02, i10, i11, i12 = (kinv_ref[0, 0, t] for t in range(6))
        rb = pl.program_id(1)
        g0 = rb * RB - HALO  # global row of scratch row 0 (may be < 0)

        def scoped(dwin, vsum, hpad, moments):
            # ---- fill the haloed depth window (zero outside the image) ----
            dwin[...] = jnp.zeros((WINH, W), jnp.float32)
            if nb == 1:
                dwin[HALO : HALO + RB, :] = depth_ref[0, :, :]
            else:

                @pl.when(rb == 0)
                def _():
                    dwin[HALO:, :] = depth_ref[0, 0 : RB + HALO, :]

                @pl.when((rb > 0) & (rb < nb - 1))
                def _():
                    # rb*RB - 8 is a multiple of 8 (RB % 8 == 0), but the
                    # divisibility prover can't see through the subtraction
                    dwin[...] = depth_ref[0, pl.ds(pl.multiple_of(g0, 8), WINH), :]

                @pl.when(rb == nb - 1)
                def _():
                    dwin[0 : RB + HALO, :] = depth_ref[0, H - RB - HALO : H, :]

            # ---- masked camera-frame points over the window ----------------
            d = dwin[...]
            d = jnp.where((d > valid_min) & (d < valid_max), d, 0.0)
            gi = (
                jax.lax.broadcasted_iota(jnp.int32, (WINH, W), 0).astype(jnp.float32)
                + jnp.float32(1.0) * g0.astype(jnp.float32)
            )
            gj = jax.lax.broadcasted_iota(jnp.int32, (WINH, W), 1).astype(jnp.float32)
            x = (i00 * gj + i01 * gi + i02) * d
            y = (i10 * gj + i11 * gi + i12) * d
            z = d  # K^-1 row 2 is (0, 0, 1) for pinhole intrinsics

            # ---- nine separable box sums ----------------------------------
            monos = (
                x * x, x * y, x * z, y * y, y * z, z * z, x, y, z
            )
            hpad[...] = jnp.zeros((RB, W + 2 * pad), jnp.float32)
            v0 = HALO - pad  # first window row of the top-most stencil tap
            for m_idx, mono in enumerate(monos):
                # vertical: k sublane-shifted adds (window is zero-padded)
                acc = mono[v0 : v0 + RB, :]
                for t in range(1, k):
                    acc = acc + mono[v0 + t : v0 + t + RB, :]
                vsum[...] = acc
                # horizontal: zero-pad lanes, k lane-shifted adds
                hpad[:, pad : pad + W] = vsum[...]
                hacc = hpad[:, 0:W]
                for t in range(1, k):
                    hacc = hacc + hpad[:, t : t + W]
                moments[m_idx, :, :] = hacc

            # ---- closed-form adjugate solve + normalize -------------------
            a, b, c, dd, e, f = (moments[t, :, :] for t in range(6))
            rx, ry, rz = (moments[t, :, :] for t in range(6, 9))
            det = (
                a * (dd * f - e * e) - b * (b * f - c * e) + c * (b * e - c * dd)
            )
            adj00 = dd * f - e * e
            adj01 = c * e - b * f
            adj02 = b * e - c * dd
            adj11 = a * f - c * c
            adj12 = b * c - a * e
            adj22 = a * dd - b * b
            nx = adj00 * rx + adj01 * ry + adj02 * rz
            ny = adj01 * rx + adj11 * ry + adj12 * rz
            nz = adj02 * rx + adj12 * ry + adj22 * rz
            singular = jnp.isnan(det) | (det < det_eps)
            inv_det = 1.0 / jnp.where(singular, 1.0, det)
            nx = jnp.where(singular, rx, nx * inv_det)
            ny = jnp.where(singular, ry, ny * inv_det)
            nz = jnp.where(singular, rz, nz * inv_det)
            norm = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-20) + norm_eps
            out_ref[0, 0, :, :] = nx / norm
            out_ref[0, 1, :, :] = ny / norm
            out_ref[0, 2, :, :] = nz / norm

        pl.run_scoped(
            scoped,
            pltpu.VMEM((WINH, W), jnp.float32),
            pltpu.VMEM((RB, W), jnp.float32),
            pltpu.VMEM((RB, W + 2 * pad), jnp.float32),
            pltpu.VMEM((9, RB, W), jnp.float32),
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k_size", "valid_min", "valid_max", "norm_eps")
)
def _depth_to_normal_pallas_impl(
    depth: jnp.ndarray,
    intrinsics_inv: jnp.ndarray,
    k_size: int = 9,
    valid_min: float = 0.0,
    valid_max: float = 10.0,
    norm_eps: float = 1e-5,
):
    """Fused depth -> unit normals; contract of ``ops.normals.depth_to_normal``.

    Args:
      depth: ``[B, H, W]`` (W % 128 == 0, H % 8 == 0).
      intrinsics_inv: ``[B, 3, 3]`` (pinhole: last row (0, 0, 1)).

    Returns:
      (normals ``[B, H, W, 3]``, points ``[B, H, W, 3]``).
    """
    B, H, W = depth.shape
    assert W % 128 == 0 and H % 8 == 0, (H, W)
    assert k_size % 2 == 1, k_size
    pad = k_size // 2
    RB = _row_block(H)
    assert RB > pad, (RB, pad)

    kinv = jnp.stack(
        [
            intrinsics_inv[:, 0, 0], intrinsics_inv[:, 0, 1], intrinsics_inv[:, 0, 2],
            intrinsics_inv[:, 1, 0], intrinsics_inv[:, 1, 1], intrinsics_inv[:, 1, 2],
        ],
        axis=-1,
    ).astype(jnp.float32)[:, None, :]  # [B, 1, 6]

    kernel = _make_kernel(
        H, W, RB, pad, float(valid_min), float(valid_max), float(norm_eps), 1e-5
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // RB),
        in_specs=[
            pl.BlockSpec((1, 1, 6), lambda b, rb: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, H, W), lambda b, rb: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, RB, W), lambda b, rb: (b, 0, rb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
    )(kinv, depth.astype(jnp.float32))
    normals = jnp.transpose(out, (0, 2, 3, 1))
    points = pixel2cam(depth, intrinsics_inv)
    return normals, points


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def depth_to_normal_pallas(
    depth: jnp.ndarray,
    intrinsics_inv: jnp.ndarray,
    k_size: int = 9,
    valid_min: float = 0.0,
    valid_max: float = 10.0,
    norm_eps: float = 1e-5,
):
    """Fused kernel forward with the jnp implementation's VJP (see module
    docstring); drop-in for ``ops.normals.depth_to_normal``."""
    return _depth_to_normal_pallas_impl(
        depth, intrinsics_inv, k_size, valid_min, valid_max, norm_eps
    )


def _fwd(depth, intrinsics_inv, k_size, valid_min, valid_max, norm_eps):
    out = _depth_to_normal_pallas_impl(
        depth, intrinsics_inv, k_size, valid_min, valid_max, norm_eps
    )
    return out, (depth, intrinsics_inv)


def _bwd(k_size, valid_min, valid_max, norm_eps, res, cotangents):
    from cnmnet_tpu.ops import normals as _normal_ops

    depth, intrinsics_inv = res
    _, vjp = jax.vjp(
        lambda d, ki: _normal_ops.depth_to_normal(
            d, ki, k_size, valid_min, valid_max, norm_eps
        ),
        depth,
        intrinsics_inv,
    )
    return vjp(cotangents)


depth_to_normal_pallas.defvjp(_fwd, _bwd)
