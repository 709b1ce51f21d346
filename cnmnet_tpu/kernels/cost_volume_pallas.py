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
gathers per 128-wide source window with clamp+mask (zero padding outside
the frustum, matching the reference's grid_sample zeros mode,
`depthNet_model.py:220`). Window iteration is DATA-BOUNDED: homography
positions over an output block are smooth, so only the windows between the
block's min and max tap index are visited (1-2 for MVS baselines) — the
round-3 static all-windows loop made per-pixel cost scale with W/128 and
was the banded 480x640 gap (RESULTS.md round-4 kernel section).

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
* grid = (B, plane-chunks, row-bands): the transposed source has a
  grid-invariant index map along the plane and band axes so Mosaic keeps it
  in VMEM across steps; the ref block, resampling scratches, and the
  [PC, HB, W] output chunk are one 128-row band tall — the banding is what
  bounds VMEM at large resolutions (480x640 fits in ~9.5 MB).
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
_HBAND = 128  # output rows per grid step (bounds every row-indexed buffer)
_VMEM_BUDGET = 12 * 1024 * 1024  # whole-image fast path above this bands


def _gather_blocks(win: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis along lanes, blocked to the <= 128-wide windows the
    hardware gather supports (wider gathers silently miscompile)."""
    S, L = idx.shape
    if L == _LANE:
        return jnp.take_along_axis(win, idx, axis=1)
    return jnp.concatenate(
        [
            jnp.take_along_axis(win, idx[:, ob * _LANE : (ob + 1) * _LANE], axis=1)
            for ob in range(L // _LANE)
        ],
        axis=1,
    )


def _interp1d_mc(load_win, C: int, pos: jnp.ndarray, width: int, valid_hi: int):
    """Shared-position multi-channel linear interp.

    ``load_win(c, w) -> [S, 128]`` reads window ``w`` (source columns
    [w*128, w*128 + 128)) of channel ``c``'s rows ``[S, width]``
    (width % 128 == 0). ``pos [S, L]`` positions are shared by every
    channel; taps outside [0, valid_hi - 1] contribute zero (the
    grid_sample zeros mode). Returns a list of C ``[S, L]`` fp32 arrays.

    The position arithmetic (floor, tap weights, per-window masks) is
    computed ONCE and reused across channels — the channel loop adds only
    the two gathers and a weighted accumulate. Compared to the round-3
    channel-stacked formulation ([C*S, L] everything), this does 1/C the
    position math and its live temporaries are [S, L], not [C*S, L] — the
    footprint reduction that lets the banded 480x640 path run the full
    128-row tile inside the ~16 MB scoped VMEM (VERDICT r3 weak #1).

    The window loop is DATA-BOUNDED: homography positions over a 128-wide
    output block are smooth, so only windows in
    [min(i0c)//128, max(i1c)//128] can hold a tap — exact, because every
    (clipped) tap index lies in that range and out-of-range windows would
    contribute zero anyway. A static loop over all width/128 windows made
    per-pixel cost scale with the image width (the measured 1.8x banded
    per-pixel gap at W=640, VERDICT r3 weak #1); for MVS baselines a block
    touches 1-2 windows regardless of W. ``load_win`` must therefore accept
    a TRACED window index (dynamic 128-aligned lane-dim slices — probed
    exact on the v5e, including take_along_axis inside the dynamic loop).
    """
    S, L = pos.shape
    p0 = jnp.floor(pos)
    f = pos - p0
    i0 = p0.astype(jnp.int32)
    i1 = i0 + 1
    w0 = jnp.where((i0 >= 0) & (i0 <= valid_hi - 1), 1.0 - f, 0.0)
    w1 = jnp.where((i1 >= 0) & (i1 <= valid_hi - 1), f, 0.0)
    i0c = jnp.clip(i0, 0, width - 1)
    i1c = jnp.clip(i1, 0, width - 1)

    def window_body(w, outs):
        l0 = i0c - w * _LANE
        in0 = (l0 >= 0) & (l0 < _LANE)
        l0c = jnp.clip(l0, 0, _LANE - 1)
        l1 = i1c - w * _LANE
        in1 = (l1 >= 0) & (l1 < _LANE)
        l1c = jnp.clip(l1, 0, _LANE - 1)
        new = []
        for c in range(C):
            win = load_win(c, w)
            g0 = jnp.where(in0, _gather_blocks(win, l0c), 0.0)
            g1 = jnp.where(in1, _gather_blocks(win, l1c), 0.0)
            new.append(outs[c] + g0 * w0 + g1 * w1)
        return tuple(new)

    outs = tuple(jnp.zeros((S, L), jnp.float32) for _ in range(C))
    n_windows = width // _LANE
    if n_windows <= 2:
        # small widths: the static unroll pipelines better than a dynamic
        # scalar loop (measured 0.49 -> 0.65 ms/pair at 192x256 when the
        # 2-window case ran the dynamic form)
        for w in range(n_windows):
            outs = window_body(w, outs)
    else:
        w_lo = jnp.min(i0c) // _LANE
        w_hi = jnp.max(i1c) // _LANE
        outs = jax.lax.fori_loop(w_lo, w_hi + 1, window_body, outs)
    return list(outs)


_SCOPED_VMEM = 16 * 1024 * 1024  # Mosaic scoped-VMEM compile limit
# Live [HT, WC]-shaped fp32/int32 temporaries in one pass-H interp chunk
# (position math + per-window masks + gather results + accumulators) — the
# knob that converts "VMEM left after the fixed blocks" into a pass-H
# column-chunk width. Calibrated from the hardware compile probe at banded
# 480x640/tile-128 (measured 17.13 MB total with fixed blocks ~10.5 MB ->
# ~20.3 live arrays), plus margin.
_TEMP_ARRAYS = 24


def _tile(extent: int, cap: int = 128) -> int:
    """Largest sublane tile in {128, ..., 8} dividing ``extent``, <= ``cap``.

    The two resampling passes iterate fori_loops whose bodies gather
    [tile, width] blocks; at tile=8 the scalar core's loop orchestration
    (~59 iterations/plane at 192x256) is a measurable fraction of the
    kernel, so both passes run the widest tile their extent allows —
    same gathers, same math, up to 16x fewer loop iterations (lane width
    stays 128; only the sublane count grows, which Mosaic vectorizes
    freely). Measured on the v5e (tools/bench_cv.py): 0.80 (tile 8) ->
    0.54 (32) -> 0.50 (64) -> 0.48 ms/pair (128) at batch; B=1 noisy but
    >= as fast.

    The caller caps the pass-H tile by ESTIMATED temporaries (ADVICE r3:
    a function of the gather width and the fixed blocks, not of
    banded-vs-unbanded): pass-H interp temporaries are ~_TEMP_ARRAYS
    [HT, W] arrays, so HT shrinks when W is large and the fixed blocks
    already crowd the 16 MB scoped VMEM. Pass-V temporaries are
    [VT, band-height] — never the binding constraint.
    """
    for t in (128, 64, 32, 16, 8):
        if t <= cap and extent % t == 0:
            return t
    return 8


def _fixed_vmem(W: int, Hp: int, C: int, PC: int, out_dtype, HB: int, RB: int) -> int:
    """Fixed VMEM blocks: src_t (grid-invariant index map -> single
    buffer), the pipelined ref/out blocks (double-buffered), and the two
    run_scoped transpose scratches."""
    return (
        4 * C * W * Hp
        + 2 * 4 * C * RB * W
        + 2 * jnp.dtype(out_dtype).itemsize * PC * RB * W
        + 2 * 4 * C * HB * W
    )


def _wc_chunk(W: int, HT: int, fixed: int) -> int:
    """Pass-H output-column chunk width from estimated VMEM (ADVICE r3:
    key the cap on the actual working set, not banded-vs-unbanded — an
    unbanded W=640 small-H shape hits the same wall).

    The interp temporaries are ~_TEMP_ARRAYS live [HT, WC] arrays, so
    instead of shrinking the row tile when W is large (the round-3 cap
    that cost the banded path 1.8x per pixel), shrink the column chunk:
    compute per (chunk, window) is unchanged — only loop orchestration
    grows. WC must be a lane-multiple divisor of W so chunks tile W
    exactly."""
    avail = max(_SCOPED_VMEM - fixed, 0)
    cap = avail // (_TEMP_ARRAYS * 4 * max(HT, 1))
    best = _LANE
    wc = _LANE
    while wc <= W:
        if W % wc == 0 and wc <= cap:
            best = wc
        wc += _LANE
    return best


def _make_kernel(
    H8: int, W: int, Hp: int, C: int, PC: int, out_dtype, HB: int, RB: int,
    tile_max: int = 128,
):
    """Band-tiled kernel: grid step (b, pc, hb) computes PC planes of the
    HB output rows [hb*HB, hb*HB + HB). Only the full source image
    (`src_t`, for pass V's arbitrary-row gathers) scales with the image
    height in VMEM; every row-indexed buffer (the two resampling scratches,
    the ref block, the output block) is HB rows — which is what lets
    480x640 (a ~25 MB whole-image working set) fit the ~16 MB VMEM.

    H8: valid output rows (8-aligned). Hp: padded source-column length
    (= bands * HB, lane-aligned). HB == Hp means one band — the
    whole-image-resident fast path used whenever it fits VMEM; banding is
    engaged only for resolutions whose working set would not (it costs
    ~1.5x at the flagship shape: doubled grid steps and padded rows).
    """
    eps = 1e-8
    VT = _tile(W, tile_max)  # pass-V source-column tile ([VT, HB] temps)
    HT = _tile(RB, tile_max)  # pass-H output-row tile
    WC = _wc_chunk(W, HT, _fixed_vmem(W, Hp, C, PC, out_dtype, HB, RB))
    row_blocks = RB // HT  # ref/out row tiles per band
    col_chunks = W // WC  # pass-H output-column chunks per row tile

    def kernel(coef_ref, ref_img_ref, src_t_ref, out_ref):
        (
            r00, r01, r02, r10, r11, r12, r20, r21, r22,
            ktx, kty, ktz, idepth0, idepth_step,
        ) = (coef_ref[0, 0, k] for k in range(14))

        pc = pl.program_id(1)
        # first output row of this band; the 1-band fast path has a 2-D
        # grid and a literal 0 so its trace carries no band arithmetic
        banded = HB != Hp
        row0 = pl.program_id(2) * RB if banded else 0

        def scoped(a_t, a):
            def plane_body(k, _):
                p = pc * PC + k
                idp = idepth0 + idepth_step * p.astype(jnp.float32)
                ax = r02 + ktx * idp
                ay = r12 + kty * idp
                az = r22 + ktz * idp

                # ---- pass V: A^T[u, i] = src[Y(i, u), u], i in band ----
                u_s = jax.lax.broadcasted_iota(jnp.int32, (VT, HB), 0).astype(jnp.float32)
                i_l = jax.lax.broadcasted_iota(jnp.int32, (VT, HB), 1)
                if banded:
                    i_l = i_l + row0
                i_l = i_l.astype(jnp.float32)

                def col_block(ub, _):
                    u = u_s + (ub * VT).astype(jnp.float32)
                    bx = r01 * i_l + ax
                    bz = r21 * i_l + az
                    den_j = r00 - r20 * u
                    den_j = jnp.where(jnp.abs(den_j) < eps, eps, den_j)
                    jj = (bz * u - bx) / den_j
                    den_y = r20 * jj + r21 * i_l + az
                    den_y = jnp.where(jnp.abs(den_y) < eps, eps, den_y)
                    Y = (r10 * jj + r11 * i_l + ay) / den_y
                    Y = jnp.clip(Y, -2.0, jnp.float32(Hp))
                    # shared-position gather: Y is channel-invariant, so the
                    # position math runs once and only the gathers repeat
                    chans = _interp1d_mc(
                        lambda c, w: src_t_ref[
                            0, c, pl.ds(ub * VT, VT), pl.ds(w * _LANE, _LANE)
                        ],
                        C, Y, Hp, H8,
                    )
                    for c in range(C):
                        a_t[c, pl.ds(ub * VT, VT), :] = chans[c]
                    return _

                jax.lax.fori_loop(0, W // VT, col_block, 0)

                # ---- transpose A^T [C, W, HB] -> A [C, HB, W] ----------
                for c in range(C):
                    a[c, :, :] = a_t[c, :, :].T

                # ---- pass H + cost over the band's valid rows ----------
                # column-chunked: temporaries are [HT, WC], so the full
                # 128-row tile fits scoped VMEM at any W (the chunk loop
                # re-runs the window masks per chunk — same total elements,
                # only more loop orchestration)
                i_s = jax.lax.broadcasted_iota(jnp.int32, (HT, WC), 0).astype(jnp.float32)
                j_s = jax.lax.broadcasted_iota(jnp.int32, (HT, WC), 1).astype(jnp.float32)

                def row_block(rb_ix, _):
                    ib = rb_ix // col_chunks if col_chunks > 1 else rb_ix
                    jb = rb_ix % col_chunks if col_chunks > 1 else 0
                    off = row0 + ib * HT if banded else ib * HT
                    i = i_s + jnp.asarray(off, jnp.float32)
                    j_l = j_s + jnp.asarray(jb * WC, jnp.float32)
                    numx = r00 * j_l + r01 * i + ax
                    den = r20 * j_l + r21 * i + az
                    behind = den <= eps
                    den = jnp.where(jnp.abs(den) < eps, eps, den)
                    x = jnp.clip(numx / den, -2.0, jnp.float32(W))
                    # shared-position horizontal interp (as in pass V)
                    chans = _interp1d_mc(
                        lambda c, w: a[
                            c, pl.ds(ib * HT, HT), pl.ds(w * _LANE, _LANE)
                        ],
                        C, x, W, W,
                    )
                    cost = jnp.zeros((HT, WC), jnp.float32)
                    for c in range(C):
                        vals = jnp.where(behind, 0.0, chans[c])
                        cost = cost + jnp.abs(
                            vals
                            - ref_img_ref[
                                0, c, pl.ds(ib * HT, HT), pl.ds(jb * WC, WC)
                            ]
                        )
                    out_ref[
                        0, k, pl.ds(ib * HT, HT), pl.ds(jb * WC, WC)
                    ] = cost.astype(out_dtype)
                    return _

                # Static bound: single-band (HB == Hp) stops exactly at
                # H8; multi-band last-band rows past H8 compute garbage
                # that the caller crops (zeros-padded inputs, so no
                # NaN/inf can escape into the valid region). A dynamic
                # bound measured markedly slower (scalar while-loop per
                # plane per band).
                jax.lax.fori_loop(0, row_blocks * col_chunks, row_block, 0)
                return _

            jax.lax.fori_loop(0, PC, plane_body, 0)

        pl.run_scoped(
            scoped,
            pltpu.VMEM((C, W, HB), jnp.float32),
            pltpu.VMEM((C, HB, W), jnp.float32),
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


def cost_volume_pallas(
    ref_images: jnp.ndarray,
    src_images: jnp.ndarray,
    ref_cam: Camera,
    src_cam: Camera,
    idepth_scale: float = 3.0,
    num_planes: int = 64,
    out_dtype=jnp.float32,
    vmem_budget: int | None = None,
    tile_max: int | None = None,
) -> jnp.ndarray:
    """Public entry — resolves the CNMNET_CV_TILE_MAX bench knob at CALL
    time and threads it as a static jit arg, so changing the env var
    between same-shape calls in one process retraces instead of silently
    reusing the previous tile (ADVICE r3). Callers inside an outer jit
    still bind the value at their own trace time."""
    import os

    if tile_max is None:
        tile_max = int(os.environ.get("CNMNET_CV_TILE_MAX", "128"))
    return _cost_volume_pallas_jit(
        ref_images, src_images, ref_cam, src_cam,
        idepth_scale=idepth_scale, num_planes=num_planes,
        out_dtype=out_dtype, vmem_budget=vmem_budget, tile_max=tile_max,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "idepth_scale", "num_planes", "out_dtype", "vmem_budget", "tile_max"
    ),
)
def _cost_volume_pallas_jit(
    ref_images: jnp.ndarray,
    src_images: jnp.ndarray,
    ref_cam: Camera,
    src_cam: Camera,
    idepth_scale: float = 3.0,
    num_planes: int = 64,
    out_dtype=jnp.float32,
    vmem_budget: int | None = None,
    tile_max: int = 128,
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
    Hp = _round_up(H8, _LANE)
    # Band only when the whole-image-resident working set would blow VMEM
    # (the single-band path is ~1.5x faster at shapes that fit).
    # ``vmem_budget`` overrides the default so tests can force the banded
    # path at small shapes.
    budget = _VMEM_BUDGET if vmem_budget is None else int(vmem_budget)
    unbanded = 4 * (3 * C * Wp_ * Hp + C * H8 * Wp_ + _PCHUNK * H8 * Wp_)
    HB = Hp if unbanded <= budget else _HBAND
    Hp = _round_up(H8, HB)  # padded source-column length, lane-aligned
    # RB: ref/output rows per band — tight H8 in the single-band fast path
    # (no padded pass-H rows or writeback), HB when banding.
    RB = H8 if HB == Hp else HB
    bands = Hp // HB
    Pp = _round_up(num_planes, _PCHUNK)
    coef = _pack_coefs(ref_cam, src_cam, idepth_scale, num_planes)
    # pad (padded cost rows are cropped; the zero source rows sample as
    # zeros = the frustum's zeros mode)
    if (bands * RB, Wp_) != (H, W):
        ref_images = jnp.pad(
            ref_images,
            ((0, 0), (0, bands * RB - H), (0, Wp_ - W), (0, 0)),
        )
    if (Hp, Wp_) != (H, W):
        src_images = jnp.pad(
            src_images, ((0, 0), (0, Hp - H), (0, Wp_ - W), (0, 0))
        )
    W = Wp_
    num_planes = Pp

    ref_chw = jnp.transpose(ref_images, (0, 3, 1, 2)).astype(jnp.float32)
    src_t = jnp.transpose(src_images, (0, 3, 2, 1)).astype(jnp.float32)

    out_dtype = jnp.dtype(out_dtype)
    kernel = _make_kernel(H8, W, Hp, C, _PCHUNK, out_dtype, HB, RB, tile_max)
    if bands == 1:  # fast path: 2-D grid, no band axis at all
        grid = (B, num_planes // _PCHUNK)
        coef_ix = lambda b, pc: (b, 0, 0)
        img_ix = lambda b, pc: (b, 0, 0, 0)
        out_ix = lambda b, pc: (b, pc, 0, 0)
    else:
        grid = (B, num_planes // _PCHUNK, bands)
        coef_ix = lambda b, pc, hb: (b, 0, 0)
        img_ix = lambda b, pc, hb: (b, 0, 0, 0)

        def _ref_ix(b, pc, hb):
            return (b, 0, hb, 0)

        def _out_ix(b, pc, hb):
            return (b, pc, hb, 0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 14), coef_ix, memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, C, RB, W),
                img_ix if bands == 1 else _ref_ix,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, C, W, Hp), img_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _PCHUNK, RB, W),
            out_ix if bands == 1 else _out_ix,
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, num_planes, bands * RB, W), out_dtype),
    )(coef, ref_chw, src_t)
    out = out[:, :P_out, :H_out, :W_out]
    return jax.lax.stop_gradient(jnp.transpose(out, (0, 2, 3, 1)))
