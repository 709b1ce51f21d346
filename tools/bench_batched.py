"""Batched 3-view refined inference throughput (frames/s/chip vs batch).

bench.py measures the flagship single-frame (batch-1) path for continuity
with the reference's per-frame eval loop (`eval.py:440-455`). At 192x256
the model is small enough that batch-1 execution is per-op latency-bound on
a v5e; batching frames (the eval harness's --frame-batch path) amortizes
that. This prints frames/s at several batch sizes — the offline/throughput
serving number.

Usage: python tools/bench_batched.py [--batches 1,4,8] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,4,8")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args(argv)

    from cnmnet_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cnmnet_tpu.geometry.camera import invert_intrinsics
    from cnmnet_tpu.kernels import dispatch
    from cnmnet_tpu.models import CNMModel
    from __graft_entry__ import _tiny_batch

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform != "cpu" else jnp.float32
    model = CNMModel(num_planes=64, dtype=dtype)

    variables = None
    for bs in [int(b) for b in args.batches.split(",")]:
        batch = _tiny_batch(bs, height=args.height, width=args.width)
        images = jnp.asarray(batch["images"])
        cams = jnp.asarray(batch["cams"])
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), images, cams, train=False)

        @jax.jit
        def forward(images, cams):
            out = model.apply(variables, images, cams, train=False)
            depth = 1.0 / (out.idepth_refined[..., 0] + 1e-8)
            K_inv = invert_intrinsics(cams[:, 0, 1, :3, :3])
            normals, _ = dispatch.depth_to_normal(depth, K_inv, 9)
            return out.idepth_refined, out.prob_map, normals

        from cnmnet_tpu.obs.timing import forward_slope_seconds

        t0 = time.monotonic()
        jax.block_until_ready(forward(images, cams))
        compile_s = time.monotonic() - t0
        dt = forward_slope_seconds(forward, images, cams)
        print(
            f"batch {bs:3d}: {bs / dt:8.1f} frames/s/chip "
            f"({dt * 1e3:6.2f} ms/call; compile+first {compile_s:.1f} s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
