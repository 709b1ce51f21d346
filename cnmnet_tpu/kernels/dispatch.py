"""Kernel backend dispatch: jnp reference impls vs Pallas TPU kernels.

Every hot op has two interchangeable implementations:

* ``jnp``   — the pure-jnp reference in ``cnmnet_tpu/ops`` (source of truth
  for tests, CPU fallback, and autodiff);
* ``pallas`` — the fused TPU kernel in ``cnmnet_tpu/kernels`` (bit-tolerance
  tested against the jnp impl).

Selection policy:

* ``backend=None`` (auto): ``pallas`` on TPU **when the kernel supports the
  shapes** (the cost-volume kernel pads arbitrary shapes exactly but is
  bounded by its VMEM working set; the normals kernel needs W % 128 == 0,
  H % 8 == 0), else ``jnp`` — with a one-time warning on TPU, where the
  jnp gather path compiles poorly;
* ``backend="pallas"`` / ``"jnp"`` (explicit, per call or via
  ``set_backend``): exactly that implementation. A requested backend that
  cannot load or cannot handle the shapes **raises** — never a silent
  fallback (round-1 shipped a phantom kernel precisely because the old
  ``except ImportError: pass`` hid it).

Exception: ``depth_to_normal`` has NO pallas path anymore — the jnp conv
formulation beats the fused kernel on TPU at every batch size, so the
kernel was demoted to a reference artifact in round 3 (see the function
docstring); ``set_backend("pallas")`` governs only ops that kept a kernel.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp

from cnmnet_tpu.ops import cost_volume as _cv_ops
from cnmnet_tpu.ops import normals as _normal_ops

_FORCED: str | None = None
_LANE = 128


@functools.cache
def _default_backend() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no devices at all
        platform = "cpu"
    return "pallas" if platform in ("tpu", "axon") else "jnp"


def get_backend() -> str:
    return _FORCED or _default_backend()


def set_backend(name: str | None) -> None:
    """Force a backend globally ('jnp' | 'pallas' | None to auto-select)."""
    global _FORCED
    if name not in (None, "jnp", "pallas"):
        raise ValueError(f"unknown backend {name!r}")
    _FORCED = name


def _import_kernel(module: str, symbol: str, explicit: bool):
    """Import a Pallas kernel; raise on failure iff explicitly requested."""
    try:
        mod = __import__(f"cnmnet_tpu.kernels.{module}", fromlist=[symbol])
        return getattr(mod, symbol)
    except (ImportError, AttributeError) as e:
        if explicit:
            raise ImportError(
                f"backend 'pallas' was requested but "
                f"cnmnet_tpu.kernels.{module}.{symbol} failed to load: {e}"
            ) from e
        _warn_fallback(f"{module}.{symbol} failed to load ({e})")
        return None


@functools.cache
def _warn_fallback(reason: str) -> None:  # once per distinct reason
    if _default_backend() == "pallas":
        warnings.warn(
            f"falling back to the jnp implementation on TPU: {reason}. "
            "The jnp gather path compiles slowly on TPU — fix the kernel or "
            "pass backend='jnp' to silence.",
            RuntimeWarning,
            stacklevel=3,
        )


def cost_volume_shapes_supported(H: int, W: int, num_planes: int, C: int = 3) -> bool:
    """Shape contract of kernels/cost_volume_pallas.py.

    The kernel zero-pads arbitrary H/W/P exactly and tiles output rows into
    128-row bands (see its docstring), so the only working-set term that
    scales with the full image height is the VMEM-resident transposed
    source [C, W, Hp]; the scratch planes, ref block and output chunk are
    one band tall. Everything must fit a v5e's ~16 MB VMEM beside
    double-buffering headroom (budget 12 MB). 7-Scenes-native 480x640/64p
    sits at ~9.5 MB; the flagship 192x256 at ~3 MB.
    """

    def _up(x, m):
        return (x + m - 1) // m * m

    HB = 128  # _HBAND
    Wp, H8 = _up(W, _LANE), _up(H, 8)
    Hp = _up(H8, HB)
    vmem = 4 * (
        C * Wp * Hp          # src_t (full height, resident across bands)
        + 2 * C * Wp * HB    # a_t / a resampling scratches (one band)
        + C * HB * Wp        # ref band
        + 8 * HB * Wp        # output chunk (f32 worst case)
    )
    return vmem <= 12 * 1024 * 1024


def normal_shapes_supported(H: int, W: int, k_size: int) -> bool:
    """Shape contract of kernels/normals_pallas.py (the demoted artifact —
    kept for its direct importers/tests; dispatch never routes to it)."""
    return W % _LANE == 0 and H % 8 == 0 and k_size % 2 == 1


def _resolve(backend, supported: bool, what: str) -> str:
    """Pick the implementation honoring the selection policy."""
    explicit = backend is not None or _FORCED is not None
    b = backend or get_backend()
    if b == "pallas" and not supported:
        if explicit:
            raise ValueError(
                f"backend 'pallas' was requested but the {what} kernel does "
                "not support these shapes ("
                + ("padded VMEM working set exceeds the budget)"
                   if what == "cost_volume"
                   else "needs W % 128 == 0, H % 8 == 0, odd k)")
            )
        _warn_fallback(f"{what}: unsupported shapes")
        return "jnp"
    return b


def cost_volume(ref_images, src_images, ref_cam, src_cam, idepth_scale=3.0,
                num_planes=64, backend=None, sampling="exact",
                out_dtype=None):
    """Batched plane-sweep cost volume ``[B, H, W, P]`` (see ops.cost_volume).

    out_dtype: volume element type (default fp32). ``bfloat16`` halves the
    volume's HBM writeback for a bf16 conv stack; cost still accumulates
    in fp32 on every backend.

    sampling: "exact" samples the source at the true pinhole projection u;
    "torch" reproduces the reference's torch-1.2-era grid_sample
    (align_corners=True after /(S/2) normalization, `depthNet_model.py:214-220`),
    which lands at u*(S-1)/S — use it when evaluating imported reference
    checkpoints. Implemented by pre-scaling the source intrinsics (identical
    math, works for every backend).
    """
    if sampling == "torch":
        H, W = ref_images.shape[1], ref_images.shape[2]
        s = jnp.asarray(
            [(W - 1) / W, (H - 1) / H, 1.0], ref_images.dtype
        )[:, None]
        src_cam = src_cam._replace(intrinsic=src_cam.intrinsic * s)
    elif sampling != "exact":
        raise ValueError(f"unknown sampling convention {sampling!r}")

    explicit = backend is not None or _FORCED is not None
    H, W, C = ref_images.shape[1], ref_images.shape[2], ref_images.shape[3]
    b = _resolve(backend, cost_volume_shapes_supported(H, W, num_planes, C),
                 "cost_volume")
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else jnp.float32
    if b == "pallas":
        fn = _import_kernel("cost_volume_pallas", "cost_volume_pallas", explicit)
        if fn is not None:
            return fn(ref_images, src_images, ref_cam, src_cam, idepth_scale,
                      num_planes, out_dtype=out_dtype)
    vol = _cv_ops.cost_volume_from_cameras(
        ref_images, src_images, ref_cam, src_cam, idepth_scale, num_planes
    )
    return vol.astype(out_dtype)


def depth_to_normal(depth, intrinsics_inv, k_size=9, backend=None):
    """Depth -> unit normals ``[B, H, W, 3]`` (+ points; see ops.normals).

    Always the jnp conv-based formulation — on TPU it IS the fast path
    (measured on v5e @ 192x256/k9: jnp 0.10 ms vs the fused Pallas kernel's
    1.38 ms at B=16; XLA fuses the monomials into MXU-efficient depthwise
    convs and is ~70% of the HBM roofline, while the kernel's unaligned
    stencil shifts pay sublane/lane relayouts that dominate at batch —
    tools/bench_normals.py). The kernel was therefore DEMOTED out of the
    dispatch surface in round 3: it survives as a correctness-tested
    reference artifact (`kernels/normals_pallas.py`, import it directly),
    and requesting ``backend="pallas"`` here is an error rather than a
    silent slow path.
    """
    if backend == "pallas":
        raise ValueError(
            "the Pallas depth->normal kernel is a demoted reference artifact "
            "(slower than the jnp conv formulation on TPU at batch; see "
            "tools/bench_normals.py). Import "
            "cnmnet_tpu.kernels.normals_pallas.depth_to_normal_pallas "
            "directly if you really want it."
        )
    return _normal_ops.depth_to_normal(depth, intrinsics_inv, k_size)
