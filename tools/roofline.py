"""Roofline accounting: per-phase FLOPs/bytes vs achieved TFLOP/s and GB/s.

For each phase (batch-1/16 3-view refined inference, batch-2/8 training at
192x256/64 planes, plus the cost-volume kernel alone) this prints:

  FLOPs and bytes-accessed from XLA's compiled cost analysis,
  chain-slope device time (the only honest timing through this tunnel —
  see obs/timing.py), achieved TFLOP/s and GB/s, and % of the v5e peaks.

v5e peaks: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM. A phase is
compute-bound when MFU% > HBM%, bandwidth-bound otherwise; "speed of
light" for the phase is the larger of the two percentages.

Usage: python tools/roofline.py [--phases fwd1,fwd16,train2,train8,cv]
Writes a markdown table to stdout (paste into RESULTS.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnmnet_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _row(name, flops, bytes_, secs):
    tflops = flops / secs / 1e12
    gbs = bytes_ / secs / 1e9
    return (
        f"| {name} | {flops / 1e9:.1f} | {bytes_ / 1e9:.2f} | "
        f"{secs * 1e3:.2f} | {tflops:.1f} | {100 * tflops / V5E_BF16_TFLOPS:.0f}% | "
        f"{gbs:.0f} | {100 * gbs / V5E_HBM_GBS:.0f}% |"
    )


def _train_slope(step, state, batch, ks=(4, 16, 48)):
    """Chain-slope per-step seconds (tools/step_time_slope.py method)."""
    state, metrics = step(state, batch)
    float(metrics["loss"])
    results = []
    for k in ks:
        t0 = time.monotonic()
        for _ in range(k):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        results.append((k, time.monotonic() - t0))
    (k1, t1), (k2, t2) = results[-2], results[-1]
    return (t2 - t1) / (k2 - k1)


def make_forward(model, variables, k_size=9):
    from cnmnet_tpu.geometry.camera import invert_intrinsics
    from cnmnet_tpu.kernels import dispatch

    @jax.jit
    def forward(images, cams):
        out = model.apply(variables, images, cams, train=False)
        depth = 1.0 / (out.idepth_refined[..., 0] + 1e-8)
        K_inv = invert_intrinsics(cams[:, 0, 1, :3, :3])
        normals, _ = dispatch.depth_to_normal(depth, K_inv, k_size)
        return out.idepth_refined, out.prob_map, normals

    return forward


def phase_forward(batch_size, height=192, width=256):
    from cnmnet_tpu.models import CNMModel
    from cnmnet_tpu.obs.timing import forward_slope_seconds
    from __graft_entry__ import _tiny_batch

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform != "cpu" else jnp.float32
    batch = _tiny_batch(batch_size, height=height, width=width)
    images, cams = jnp.asarray(batch["images"]), jnp.asarray(batch["cams"])
    model = CNMModel(num_planes=64, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), images, cams, train=False)
    fwd = make_forward(model, variables)
    compiled = fwd.lower(images, cams).compile()
    flops, bytes_ = _cost(compiled)
    k1, k2 = (10, 40) if platform != "cpu" else (1, 3)
    secs = forward_slope_seconds(fwd, images, cams, k1=k1, k2=k2)
    return flops, bytes_, secs, batch_size


def phase_train(batch_size, height=192, width=256, extra=()):
    from cnmnet_tpu.config import Config, apply_overrides
    from cnmnet_tpu.train.loop import make_train_step
    from cnmnet_tpu.train.state import create_train_state
    from __graft_entry__ import _tiny_batch

    cfg = apply_overrides(
        Config(),
        [
            f"dataset.batch_size={batch_size}",
            "model.num_planes=64",
            "model.compute_dtype=bfloat16",
            *extra,
        ],
    )
    batch = _tiny_batch(batch_size, height=height, width=width)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    compiled = step.lower(state, batch).compile()
    flops, bytes_ = _cost(compiled)
    secs = _train_slope(step, state, batch)
    return flops, bytes_, secs, batch_size


def phase_cost_volume():
    """The Pallas kernel alone at 192x256/64p: XLA cost analysis can't see
    inside a pallas_call, so FLOPs/bytes are analytic: per plane, per
    pixel — 2 gathers * 4 taps * (2 mul + 2 add) for the bilinear passes +
    3 abs-diff-accumulate; bytes = read ref+src (f32 in VMEM staging) +
    write the [H, W, P] bf16 volume once."""
    from cnmnet_tpu.geometry import Camera
    from cnmnet_tpu.kernels.cost_volume_pallas import cost_volume_pallas
    from cnmnet_tpu.obs.timing import forward_slope_seconds

    H, W, P, C = 192, 256, 64, 3
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)
    K = jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])[None]
    E2 = jnp.eye(4).at[0, 3].set(0.08)[None]
    c1 = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
    c2 = Camera(extrinsic=E2, intrinsic=K)

    fwd = jax.jit(
        lambda r, s: cost_volume_pallas(r, s, c1, c2, 3.0, P, out_dtype=jnp.bfloat16)
    )
    secs = forward_slope_seconds(fwd, ref, src, k1=20, k2=80)
    # analytic: ~30 flops/pixel/plane (two 4-tap lerp passes + SAD over C)
    flops = H * W * P * (2 * 4 * C + 2 * 3 * C)  # taps + |diff|+acc per ch
    bytes_ = (2 * H * W * C * 4) + (H * W * P * 2)  # images f32 + volume bf16
    return float(flops), float(bytes_), secs, 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default="fwd1,fwd16,train2,train8,cv")
    args = ap.parse_args()
    runners = {
        "fwd1": ("3-view fwd b=1", lambda: phase_forward(1)),
        "fwd16": ("3-view fwd b=16", lambda: phase_forward(16)),
        "train2": ("train step b=2", lambda: phase_train(2)),
        "train8": ("train step b=8", lambda: phase_train(8)),
        "cv": ("cost-volume kernel", phase_cost_volume),
        # native 480x640 (7-Scenes sensor resolution) phases
        "fwd1n": ("fwd b=1 @480x640", lambda: phase_forward(1, 480, 640)),
        "fwd8n": ("fwd b=8 @480x640", lambda: phase_forward(8, 480, 640)),
        "train4n": (
            "train b=4 @480x640",
            lambda: phase_train(
                4, 480, 640,
                extra=(
                    "model.remat=true", "model.remat_stages=2",
                    "model.remat_refiner=true",
                ),
            ),
        ),
    }
    print(f"platform: {jax.devices()[0].platform}")
    print(
        "| phase | GFLOP | GB | ms | TFLOP/s | MFU% | GB/s | HBM% |\n"
        "|---|---|---|---|---|---|---|---|"
    )
    for key in args.phases.split(","):
        title, fn = runners[key.strip()]
        flops, bytes_, secs, bsz = fn()
        print(_row(title, flops, bytes_, secs), flush=True)


if __name__ == "__main__":
    main()
