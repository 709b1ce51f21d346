"""Device-trace profile of the flagship forward: top ops by total time.

Captures a jax profiler trace of bench.py's exact forward (3-view refined
inference @ 192x256/64 planes) and aggregates the device timeline's op
spans from the Chrome-trace dump, printing the top-N ops by cumulative
duration. Used to find the next hotspot after each optimization round
(round 1: the 67-ch stem conv; see RESULTS.md "Profiling notes").

Caveat (machine quirk): spans of Pallas ops are inflated ~25x by
per-grid-step tracing — cross-check kernels with wall-clock benches.

Usage: python tools/profile_forward.py [--iters 10] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--logdir", default="/tmp/cnm_profile")
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
    batch = _tiny_batch(1, height=192, width=256)
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

    jax.block_until_ready(forward(images, cams))  # compile outside the trace

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        out = forward(images, cams)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    traces = sorted(
        glob.glob(
            os.path.join(args.logdir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace found under", args.logdir)
        return 1
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    # Device-lane op spans: aggregate by op name across the timeline.
    per_op = defaultdict(list)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "Device" in name or "/device" in name.lower()
    }
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        per_op[ev["name"]].append(ev["dur"])

    rows = [
        (sum(durs) / args.iters, len(durs) / args.iters, name)
        for name, durs in per_op.items()
    ]
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{'us/iter':>10} {'calls':>6}  op   (device total {total:.0f} us/iter)")
    for us, calls, name in rows[: args.top]:
        print(f"{us:10.1f} {calls:6.1f}  {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
