"""Plane-sweep cost volume as a fused Pallas TPU kernel.

Why this exists: the pure-jnp formulation (ops/cost_volume.py) expresses the
warp as a 3.1M-element gather, which XLA-TPU compiles pathologically
(minutes) and executes serially. This kernel keeps the source image resident
in VMEM and performs the per-plane homography warp with the only fast
dynamic primitive the VPU has — the 128-lane `take_along_axis` gather — via
a two-pass (Catmull-Smith) decomposition of the projective warp:

  pass V: A[i, u] = src[ Y(i, u), u ]   vertical resample of every source
          column u at Y(i, u) = y(i, x_i^{-1}(u)), using the closed-form
          inverse of the per-row projective map j -> x(i, j);
  (2-D VMEM transpose of A from column-gather layout to row layout)
  pass H: out[i, j] = A[i, x(i, j)]     horizontal resample along lanes.

Both passes are bilinear 1-D interpolations implemented as two shifted lane
gathers per 128-wide window with clamp+mask (zero padding outside the
frustum, matching the reference's grid_sample zeros mode,
`depthNet_model.py:220`).

Exactness: the decomposition evaluates the vertical coordinate at the
column's inverse-mapped position rather than at the output pixel's exact x —
a sub-centipixel deviation for multi-view-stereo geometry; tolerance-tested
against the jnp reference in tests/test_pallas_kernels.py.

No VJP: the cost volume is built from input images with no parameters
upstream, so gradients never flow through it (stop_gradient at the end).

Hardware notes (probed on TPU v5e, recorded in .claude/skills/verify):
* Mosaic `take_along_axis` works only along the minor (lane) axis with
  width <= 128 — wider or sublane gathers miscompile — hence the explicit
  128-wide window loops;
* grid = (B, plane-chunks): image blocks have grid-invariant index maps
  along the plane axis so Mosaic keeps them in VMEM across chunks; only the
  [PC, H, W] output chunk is written back per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cnmnet_tpu.geometry.camera import Camera, invert_intrinsics, relative_pose
from cnmnet_tpu.ops.cost_volume import idepth_hypotheses

_LANE = 128
_PCHUNK = 8  # planes per grid step (bounds the VMEM output block)


def _lane_gather(rows: jnp.ndarray, idx: jnp.ndarray, width: int) -> jnp.ndarray:
    """out[s, l] = rows[s, idx[s, l]] for rows [S, width], width % 128 == 0.

    One hardware gather per (source-window, output-block) pair + selects.
    Caller guarantees idx in [0, width).
    """
    S, L = idx.shape
    out = jnp.zeros((S, L), rows.dtype)
    for w in range(width // _LANE):
        win = rows[:, w * _LANE : (w + 1) * _LANE]
        local = idx - w * _LANE
        in_win = (local >= 0) & (local < _LANE)
        local_c = jnp.clip(local, 0, _LANE - 1)
        if L == _LANE:
            g = jnp.take_along_axis(win, local_c, axis=1)
        else:
            g = jnp.concatenate(
                [
                    jnp.take_along_axis(
                        win, local_c[:, ob * _LANE : (ob + 1) * _LANE], axis=1
                    )
                    for ob in range(L // _LANE)
                ],
                axis=1,
            )
        out = out + jnp.where(in_win, g, jnp.zeros_like(g))
    return out


def _interp1d(rows: jnp.ndarray, pos: jnp.ndarray, width: int, valid_hi: int):
    """Linear interp of rows [S, width] at positions pos [S, L]; taps outside
    [0, valid_hi - 1] contribute zero (zero padding)."""
    p0 = jnp.floor(pos)
    f = pos - p0
    i0 = p0.astype(jnp.int32)
    i1 = i0 + 1
    v0 = _lane_gather(rows, jnp.clip(i0, 0, width - 1), width)
    v1 = _lane_gather(rows, jnp.clip(i1, 0, width - 1), width)
    w0 = jnp.where((i0 >= 0) & (i0 <= valid_hi - 1), 1.0 - f, 0.0)
    w1 = jnp.where((i1 >= 0) & (i1 <= valid_hi - 1), f, 0.0)
    return v0 * w0 + v1 * w1


def _make_kernel(H: int, W: int, Hp: int, C: int, PC: int, out_dtype):
    eps = 1e-8

    def kernel(coef_ref, ref_img_ref, src_t_ref, out_ref):
        (
            r00, r01, r02, r10, r11, r12, r20, r21, r22,
            ktx, kty, ktz, idepth0, idepth_step,
        ) = (coef_ref[0, 0, k] for k in range(14))

        pc = pl.program_id(1)

        def scoped(a_t, a):
            def plane_body(k, _):
                p = pc * PC + k
                idp = idepth0 + idepth_step * p.astype(jnp.float32)
                ax = r02 + ktx * idp
                ay = r12 + kty * idp
                az = r22 + ktz * idp

                # ---- pass V: A^T[u, i] = src[Y(i, u), u] ---------------
                u_s = jax.lax.broadcasted_iota(jnp.int32, (8, Hp), 0).astype(jnp.float32)
                i_l = jax.lax.broadcasted_iota(jnp.int32, (8, Hp), 1).astype(jnp.float32)

                def col_block(ub, _):
                    u = u_s + (ub * 8).astype(jnp.float32)
                    bx = r01 * i_l + ax
                    bz = r21 * i_l + az
                    den_j = r00 - r20 * u
                    den_j = jnp.where(jnp.abs(den_j) < eps, eps, den_j)
                    jj = (bz * u - bx) / den_j
                    den_y = r20 * jj + r21 * i_l + az
                    den_y = jnp.where(jnp.abs(den_y) < eps, eps, den_y)
                    Y = (r10 * jj + r11 * i_l + ay) / den_y
                    Y = jnp.clip(Y, -2.0, jnp.float32(Hp))
                    for c in range(C):
                        cols = src_t_ref[0, c, pl.ds(ub * 8, 8), :]  # [8, Hp]
                        a_t[c, pl.ds(ub * 8, 8), :] = _interp1d(cols, Y, Hp, H)
                    return _

                jax.lax.fori_loop(0, W // 8, col_block, 0)

                # ---- transpose A^T [C, W, Hp] -> A [C, Hp, W] ----------
                for c in range(C):
                    a[c, :, :] = a_t[c, :, :].T

                # ---- pass H + cost -------------------------------------
                i_s = jax.lax.broadcasted_iota(jnp.int32, (8, W), 0).astype(jnp.float32)
                j_l = jax.lax.broadcasted_iota(jnp.int32, (8, W), 1).astype(jnp.float32)

                def row_block(ib, _):
                    i = i_s + (ib * 8).astype(jnp.float32)
                    numx = r00 * j_l + r01 * i + ax
                    den = r20 * j_l + r21 * i + az
                    behind = den <= eps
                    den = jnp.where(jnp.abs(den) < eps, eps, den)
                    x = jnp.clip(numx / den, -2.0, jnp.float32(W))
                    cost = jnp.zeros((8, W), jnp.float32)
                    for c in range(C):
                        rows = a[c, pl.ds(ib * 8, 8), :]  # [8, W]
                        vals = _interp1d(rows, x, W, W)
                        vals = jnp.where(behind, 0.0, vals)
                        cost = cost + jnp.abs(
                            vals - ref_img_ref[0, c, pl.ds(ib * 8, 8), :]
                        )
                    out_ref[0, k, pl.ds(ib * 8, 8), :] = cost.astype(out_dtype)
                    return _

                jax.lax.fori_loop(0, H // 8, row_block, 0)
                return _

            jax.lax.fori_loop(0, PC, plane_body, 0)

        pl.run_scoped(
            scoped,
            pltpu.VMEM((C, W, Hp), jnp.float32),
            pltpu.VMEM((C, Hp, W), jnp.float32),
        )

    return kernel


def _pack_coefs(ref_cam: Camera, src_cam: Camera, idepth_scale, num_planes):
    """Per-pair homography coefficients -> [B, 14] fp32 (SMEM scalars)."""
    rel = relative_pose(ref_cam, src_cam)
    R = rel[..., :3, :3]
    t = rel[..., :3, 3:4]
    hi = jax.lax.Precision.HIGHEST
    KRKi = jnp.matmul(
        jnp.matmul(src_cam.intrinsic, R, precision=hi),
        invert_intrinsics(ref_cam.intrinsic),
        precision=hi,
    )
    KT = jnp.matmul(src_cam.intrinsic, t, precision=hi)[..., 0]
    idepths = idepth_hypotheses(idepth_scale, num_planes)
    step = idepths[1] - idepths[0] if num_planes > 1 else jnp.float32(0.0)
    cols = [
        KRKi[:, 0, 0], KRKi[:, 0, 1], KRKi[:, 0, 2],
        KRKi[:, 1, 0], KRKi[:, 1, 1], KRKi[:, 1, 2],
        KRKi[:, 2, 0], KRKi[:, 2, 1], KRKi[:, 2, 2],
        KT[:, 0], KT[:, 1], KT[:, 2],
        jnp.broadcast_to(idepths[0], KT[:, 0].shape),
        jnp.broadcast_to(step, KT[:, 0].shape),
    ]
    return jnp.stack(cols, axis=-1).astype(jnp.float32)[:, None, :]  # [B, 1, 14]


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("idepth_scale", "num_planes", "out_dtype")
)
def cost_volume_pallas(
    ref_images: jnp.ndarray,
    src_images: jnp.ndarray,
    ref_cam: Camera,
    src_cam: Camera,
    idepth_scale: float = 3.0,
    num_planes: int = 64,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched plane-sweep cost volume, NHWC -> [B, H, W, P] (``out_dtype``).

    Same contract as ops.cost_volume.cost_volume_from_cameras. The per-plane
    cost accumulates in fp32 regardless; ``out_dtype=bfloat16`` rounds only
    the VMEM writeback (halving the volume's HBM traffic and the transpose
    feeding the bf16 conv stack).

    Arbitrary shapes: the kernel grid itself needs W % 128 == 0, H % 8 == 0
    and P % 8 == 0; other shapes are zero-padded in and cropped out. This is
    *exact*, not approximate: zero-padding the source is identical to the
    zeros-mode sampling the kernel already implements (out-of-frustum taps
    contribute 0 either way), padded ref rows/cols only produce cost rows
    that are cropped, and padded planes extend the linear idepth ramp beyond
    hypothesis P-1 (the ramp itself — idepth0/step — is computed from the
    *requested* plane count, so the kept planes are unchanged).
    """
    B, H, W, C = ref_images.shape
    H_out, W_out, P_out = H, W, num_planes
    Wp_ = _round_up(W, _LANE)
    H8 = _round_up(H, 8)
    Pp = _round_up(num_planes, _PCHUNK)
    coef = _pack_coefs(ref_cam, src_cam, idepth_scale, num_planes)
    if (Wp_, H8) != (W, H):
        pad_hw = ((0, 0), (0, H8 - H), (0, Wp_ - W), (0, 0))
        ref_images = jnp.pad(ref_images, pad_hw)
        src_images = jnp.pad(src_images, pad_hw)
        H, W = H8, Wp_
    num_planes = Pp
    Hp = _round_up(H, _LANE)

    ref_chw = jnp.transpose(ref_images, (0, 3, 1, 2)).astype(jnp.float32)
    src_t = jnp.transpose(src_images, (0, 3, 2, 1)).astype(jnp.float32)
    pad = Hp - H
    if pad:
        src_t = jnp.pad(src_t, ((0, 0), (0, 0), (0, 0), (0, pad)))

    out_dtype = jnp.dtype(out_dtype)
    kernel = _make_kernel(H, W, Hp, C, _PCHUNK, out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, num_planes // _PCHUNK),
        in_specs=[
            pl.BlockSpec((1, 1, 14), lambda b, pc: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, C, H, W), lambda b, pc: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, C, W, Hp), lambda b, pc: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _PCHUNK, H, W), lambda b, pc: (b, pc, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, num_planes, H, W), out_dtype),
    )(coef, ref_chw, src_t)
    out = out[:, :P_out, :H_out, :W_out]
    return jax.lax.stop_gradient(jnp.transpose(out, (0, 2, 3, 1)))
