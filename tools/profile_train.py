"""Device-trace profile of the full training step: top ops by total time.

Same methodology as tools/profile_forward.py but over the jitted
``make_train_step`` program (forward + 12-term CNM loss + backward + Adam)
with a device-resident batch — the configuration RESULTS.md's 54.2 ms/step
(batch 2, 192x256, 64 planes, bf16) was measured in. Prints wall-clock
ms/step first (the trustworthy number), then the aggregated device op
spans from the Chrome-trace dump to locate backward hotspots.

Usage: python tools/profile_train.py [--batch 2] [--iters 10] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--logdir", default="/tmp/cnm_profile_train")
    p.add_argument("--no-trace", action="store_true", help="wall clock only")
    args = p.parse_args(argv)

    from cnmnet_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from cnmnet_tpu.config import Config, apply_overrides
    from cnmnet_tpu.train.loop import make_train_step
    from cnmnet_tpu.train.state import create_train_state
    from __graft_entry__ import _tiny_batch

    platform = jax.devices()[0].platform
    cfg = apply_overrides(
        Config(),
        [
            f"dataset.batch_size={args.batch}",
            f"dataset.image_height={args.height}",
            f"dataset.image_width={args.width}",
            "model.num_planes=64",
            f"model.remat={str(args.remat).lower()}",
        ]
        + (["model.compute_dtype=bfloat16"] if platform != "cpu" else []),
    )
    batch = _tiny_batch(args.batch, height=args.height, width=args.width)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    batch = jax.device_put(batch)

    t0 = time.monotonic()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first step: {time.monotonic() - t0:.1f} s", flush=True)

    # Wall clock (donated state: rebuild nothing, just loop).
    t0 = time.monotonic()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.monotonic() - t0) / args.iters
    print(
        f"wall clock: {dt * 1e3:.1f} ms/step "
        f"({args.batch / dt:.1f} samples/s/chip, batch {args.batch}, "
        f"{args.height}x{args.width}, remat={args.remat})",
        flush=True,
    )
    if args.no_trace:
        return 0

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    jax.profiler.stop_trace()

    traces = sorted(
        glob.glob(os.path.join(args.logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace found under", args.logdir)
        return 1
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    per_op = defaultdict(list)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid
        for pid, name in pid_names.items()
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
