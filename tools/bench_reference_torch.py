"""Measured baseline anchor: the reference PyTorch CNMNet on this host.

The reference publishes no throughput numbers (SURVEY.md §6) and this
machine has no CUDA GPU, so the only *measurable* baseline is the reference
implementation itself on the host CPU. This tool times the reference's
`eval_refine` compute (`eval.py:440-455`) — two depthNet forwards, the
DepthRefineNet fusion, and Depth2normal — at the flagship working point
(192x256, 64 planes, 3 views), and times OUR pipeline on the same CPU for
an apples-to-apples implementation comparison on identical hardware.

Two timing spans are reported for the torch side:
  * ``nets_only`` — exactly what the reference's `time.monotonic` hooks
    wrap (`eval.py:439-450`): the two depthNet passes + refine;
  * ``full`` — nets + Depth2normal, the span our bench.py measures.

Usage: python tools/bench_reference_torch.py [--height 192 --width 256]
Prints one JSON line; wire the numbers into BASELINE.md / RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_torch_reference import (  # noqa: E402
    _to_torch_nchw,
    load_reference_nets,
    make_inputs,
    REFERENCE_ROOT,
)


def bench_torch(batch, iters: int, k_size: int = 9):
    import torch

    depthNet_cls, refine_cls = load_reference_nets()
    sys.path.insert(0, REFERENCE_ROOT)
    from depthnet.depth_util import Depth2normal  # noqa: E402

    torch.manual_seed(0)
    dnet = depthNet_cls(idepth_scale=3.0).eval()
    torch.manual_seed(1)
    rnet = refine_cls(idepth_scale=3.0).eval()
    d2n = Depth2normal(k_size)

    ref_t = _to_torch_nchw(batch["images"][:1, 0])
    src1_t = _to_torch_nchw(batch["images"][:1, 1])
    src2_t = _to_torch_nchw(batch["images"][:1, 2])
    cam0 = torch.from_numpy(batch["cams"][:1, 0]).float()
    cam1 = torch.from_numpy(batch["cams"][:1, 1]).float()
    cam2 = torch.from_numpy(batch["cams"][:1, 2]).float()
    K_inv = torch.inverse(cam0[0, 1, :3, :3]).unsqueeze(0)

    def nets():
        disps1, iconv1 = dnet(ref_t, src1_t, cam0, cam1)
        disps2, iconv2 = dnet(ref_t, src2_t, cam0, cam2)
        idepth_refined, prob = rnet(disps1[0], disps2[0], iconv1, iconv2)
        return idepth_refined, prob

    def full():
        idepth_refined, prob = nets()
        depth = torch.div(1.0, idepth_refined.squeeze(1).clamp(min=1e-8))
        normal, _ = d2n(depth, K_inv)
        return idepth_refined, prob, normal

    out = {}
    with torch.no_grad():
        for name, fn in (("nets_only", nets), ("full", full)):
            fn()  # warmup
            t0 = time.monotonic()
            for _ in range(iters):
                fn()
            out[name] = (time.monotonic() - t0) / iters
    return out


def bench_ours_cpu(batch, iters: int, k_size: int = 9):
    import jax

    jax.config.update("jax_platform_name", "cpu")
    import jax.numpy as jnp

    from cnmnet_tpu.geometry.camera import invert_intrinsics
    from cnmnet_tpu.kernels import dispatch
    from cnmnet_tpu.models import CNMModel

    model = CNMModel(num_planes=64, dtype=jnp.float32)
    images = jnp.asarray(batch["images"][:1])
    cams = jnp.asarray(batch["cams"][:1])
    variables = model.init(jax.random.PRNGKey(0), images, cams, train=False)

    @jax.jit
    def forward(images, cams):
        out = model.apply(variables, images, cams, train=False)
        depth = 1.0 / (out.idepth_refined[..., 0] + 1e-8)
        K_inv = invert_intrinsics(cams[:, 0, 1, :3, :3])
        normals, _ = dispatch.depth_to_normal(depth, K_inv, k_size)
        return out.idepth_refined, out.prob_map, normals

    jax.block_until_ready(forward(images, cams))  # compile
    t0 = time.monotonic()
    for _ in range(iters):
        out = forward(images, cams)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)

    batch = make_inputs(args.height, args.width)
    torch_times = bench_torch(batch, args.iters)
    ours = bench_ours_cpu(batch, args.iters)
    print(
        json.dumps(
            {
                "host": "cpu",
                "shape": f"{args.height}x{args.width}x64planes_3view",
                "torch_reference_nets_only_fps": round(1.0 / torch_times["nets_only"], 3),
                "torch_reference_full_fps": round(1.0 / torch_times["full"], 3),
                "ours_full_fps": round(1.0 / ours, 3),
                "ours_vs_torch_full": round(torch_times["full"] / ours, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
