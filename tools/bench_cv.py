"""Cost-volume kernel: on-chip A/B vs the jnp op + per-pair chain-slope.

Two jobs in one tool:

* numerics: any change to the kernel's gather shapes MUST be re-validated
  on hardware — Mosaic take_along_axis silently miscompiles for sublane or
  flat gathers (CLAUDE.md), so interpret-mode CPU tests are necessary but
  not sufficient. Compares against the jnp reference at a small shape
  (the jnp gather formulation never finishes compiling on TPU at 192x256,
  so the full-shape check is banded-vs-unbanded self-consistency).
* timing: honest per-pair ms by chain-slope (forward_slope_seconds) at
  several batch sizes — per-iteration wall clocks lie through this tunnel.

Usage: python tools/bench_cv.py [--batches 1,8,16] [--skip-ab]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnmnet_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from cnmnet_tpu.geometry import Camera
from cnmnet_tpu.kernels.cost_volume_pallas import cost_volume_pallas
from cnmnet_tpu.obs.timing import forward_slope_seconds


def _cams(B, H, W):
    K = jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    K = jnp.broadcast_to(K, (B, 3, 3))
    E1 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    E2 = jnp.broadcast_to(jnp.eye(4).at[0, 3].set(0.08), (B, 4, 4))
    return Camera(extrinsic=E1, intrinsic=K), Camera(extrinsic=E2, intrinsic=K)


def ab_check():
    from cnmnet_tpu.ops.cost_volume import cost_volume_from_cameras

    rng = np.random.default_rng(0)
    # small shape: jnp reference compiles on TPU here
    H, W, P = 40, 130, 9
    ref = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
    c1, c2 = _cams(2, H, W)
    got = np.asarray(cost_volume_pallas(ref, src, c1, c2, 3.0, P))
    want = np.asarray(cost_volume_from_cameras(ref, src, c1, c2, 3.0, P))
    err = np.max(np.abs(got - want))
    print(f"A/B vs jnp @ {H}x{W}/{P}p: max abs err {err:.2e}")
    assert err < 5e-3, err

    # flagship + banded self-consistency (banded forced via vmem_budget)
    H, W, P = 192, 256, 64
    ref = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    c1, c2 = _cams(1, H, W)
    full = np.asarray(cost_volume_pallas(ref, src, c1, c2, 3.0, P))
    banded = np.asarray(
        cost_volume_pallas(ref, src, c1, c2, 3.0, P, vmem_budget=1 << 20)
    )
    err = np.max(np.abs(full - banded))
    print(f"banded vs unbanded @ {H}x{W}/{P}p: max abs err {err:.2e}")
    assert err < 1e-5, err


def bench(batches, H=192, W=256, P=64):
    rng = np.random.default_rng(0)
    print("| B | ms/call | ms/pair |\n|---|---|---|")
    for B in batches:
        ref = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        c1, c2 = _cams(B, H, W)
        fwd = jax.jit(
            lambda r, s: cost_volume_pallas(
                r, s, c1, c2, 3.0, P, out_dtype=jnp.bfloat16
            )
        )
        secs = forward_slope_seconds(fwd, ref, src, k1=20, k2=80)
        print(f"| {B} | {secs * 1e3:.2f} | {secs / B * 1e3:.3f} |", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,16")
    ap.add_argument("--skip-ab", action="store_true")
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--planes", type=int, default=64)
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform)
    if not args.skip_ab:
        ab_check()
    bench(
        [int(b) for b in args.batches.split(",")],
        H=args.height, W=args.width, P=args.planes,
    )


if __name__ == "__main__":
    main()
