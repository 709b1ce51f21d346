"""Scaling-efficiency sweep harness (BASELINE configs 3-5).

Runs the full jitted train step over a sequence of mesh shapes and reports
per-step wall time, throughput, and scaling efficiency relative to the
smallest mesh. On this machine only virtual CPU meshes (logic validation)
and the single real chip are available; on a pod slice the same harness
measures real ICI/DCN scaling — mesh construction is identical.

Usage:
  JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_sweep.py --meshes 1x1,2x1,4x1,8x1,4x2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--meshes", default="1x1,2x1,4x1,8x1")
    p.add_argument("--height", type=int, default=32)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--planes", type=int, default=16)
    p.add_argument("--per-device-batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cnmnet_tpu.cache import enable_compilation_cache

    enable_compilation_cache()

    from cnmnet_tpu.config import Config
    from cnmnet_tpu.parallel.mesh import make_mesh
    from cnmnet_tpu.train.loop import make_train_step
    from cnmnet_tpu.train.state import create_train_state
    from __graft_entry__ import _tiny_batch

    results = []
    base_rate = None
    for mesh_str in args.meshes.split(","):
        data, tile = (int(v) for v in mesh_str.split("x"))
        n = data * tile
        if n > jax.device_count():
            print(f"skip {mesh_str}: only {jax.device_count()} devices")
            continue
        mesh = make_mesh(data=data, tile=tile, devices=jax.devices()[:n])

        cfg = Config()
        cfg.model.num_planes = args.planes
        cfg.model.k_size = 5
        global_batch = args.per_device_batch * data
        batch = _tiny_batch(global_batch, height=args.height, width=args.width)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        step = make_train_step(cfg, mesh=mesh)
        state, m = step(state, batch)  # compile
        jax.block_until_ready(m["loss"])

        t0 = time.monotonic()
        for _ in range(args.iters):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        dt = (time.monotonic() - t0) / args.iters
        rate = global_batch / dt
        if base_rate is None:
            base_rate = rate / n  # per-device rate at the smallest mesh
        eff = rate / (n * base_rate)
        results.append(
            {
                "mesh": mesh_str,
                "devices": n,
                "global_batch": global_batch,
                "step_ms": round(dt * 1000, 2),
                "samples_per_s": round(rate, 2),
                "scaling_efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"sweep": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
