"""Per-protocol inference timing: view counts and resolutions.

Measures the refined eval forward (same program as bench.py) across the
reference's protocols (3/5/7 views, `eval.py:408-415,586-592,822-830`)
and optionally at the 7-Scenes native 480x640 resolution (the Pallas cost
volume's zero-pad path: 640 = 5x128 lanes, 480 = 60x8 sublanes).

Usage: python tools/bench_protocols.py [--views 3,5,7] [--sizes 192x256,480x640]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--views", default="3,5,7")
    p.add_argument("--sizes", default="192x256")
    p.add_argument("--iters", type=int, default=30)
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

    for size in args.sizes.split(","):
        h, w = (int(v) for v in size.split("x"))
        for views in (int(v) for v in args.views.split(",")):
            batch = _tiny_batch(1, height=h, width=w, views=views)
            images = jnp.asarray(batch["images"])
            cams = jnp.asarray(batch["cams"])
            if variables is None:
                variables = model.init(
                    jax.random.PRNGKey(0), images, cams, train=False
                )

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
                f"{views}-view @ {h}x{w}: {1.0 / dt:7.1f} frames/s/chip "
                f"({dt * 1e3:6.2f} ms/frame; compile+first {compile_s:.1f} s)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
