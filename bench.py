"""Benchmark: 3-view refined depth inference, frames/s on one chip.

Measures the flagship end-to-end path at the reference's working point
(192x256, 64-plane cost volumes, 1 ref + 2 source views): two plane-sweep
volumes, the folded DepthNet pass, RefineNet fusion, and the depth->normal
operator — the exact compute of the reference's `eval_refine` inner loop
(`eval.py:440-455`), compiled as one XLA program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6);
its timing hooks ran a V100-class GPU. We anchor the baseline at 10 frames/s
for the same 3-view refined forward on a V100 (fp32 cuDNN at this
resolution; conservative versus the per-forward `time.monotonic` hooks the
reference prints), so the BASELINE.md target of >= 3x V100 means
vs_baseline >= 3.0. The *measured* same-host comparison backing this up:
tools/bench_reference_torch.py times the reference implementation against
ours on this machine's CPU — identical hardware, identical computation —
and ours is 4.1x faster (BASELINE.md "Measured same-host baseline").
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_BASELINE_FPS = 10.0


def main(height: int = 192, width: int = 256):
    import jax

    from cnmnet_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from cnmnet_tpu.geometry.camera import invert_intrinsics
    from cnmnet_tpu.kernels import dispatch
    from cnmnet_tpu.models import CNMModel
    from __graft_entry__ import _tiny_batch

    platform = jax.devices()[0].platform
    batch = _tiny_batch(1, height=height, width=width)

    dtype = jnp.bfloat16 if platform != "cpu" else jnp.float32
    model = CNMModel(num_planes=64, dtype=dtype)
    images = jnp.asarray(batch["images"])
    cams = jnp.asarray(batch["cams"])
    variables = model.init(jax.random.PRNGKey(0), images, cams, train=False)

    @jax.jit
    def forward(images, cams):
        out = model.apply(variables, images, cams, train=False)
        depth = 1.0 / (out.idepth_refined[..., 0] + 1e-8)
        K_inv = invert_intrinsics(cams[:, 0, 1, :3, :3])
        normals, _ = dispatch.depth_to_normal(depth, K_inv, 9)
        return out.idepth_refined, out.prob_map, normals

    # warmup / compile
    out = forward(images, cams)
    jax.block_until_ready(out)

    # chain-slope timing: immune to the tunneled runtime's memoization of
    # identical calls and to early-returning block_until_ready (both
    # observed on this machine — see obs/timing.py and RESULTS.md)
    from cnmnet_tpu.obs.timing import forward_slope_seconds

    if platform != "cpu":
        dt = forward_slope_seconds(forward, images, cams, k1=10, k2=40)
    else:
        dt = forward_slope_seconds(forward, images, cams, k1=1, k2=4)

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "3view_refined_fps_per_chip"
                + ("" if (height, width) == (192, 256) else f"_{height}x{width}"),
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / V100_BASELINE_FPS, 3),
                # the anchor is an ESTIMATE (no published throughput to
                # beat, SURVEY.md §6); the measured same-host comparison is
                # tools/bench_reference_torch.py: ours 4.1x the reference on
                # identical CPU hardware (BASELINE.md)
                "baseline_kind": "estimated 10 fps V100",
                "measured_same_host_speedup": 4.1,
            }
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    a = ap.parse_args()
    main(height=a.height, width=a.width)
