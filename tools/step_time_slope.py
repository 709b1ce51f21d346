"""True train-step device time via the chain-slope method.

Through this machine's tunneled TPU, `block_until_ready` on the train
step's outputs can return before remote execution completes (observed:
chained "3.8 ms/step" at batch 8 while the batch-8 *forward alone* takes
44 ms — impossible), so per-iteration wall clocks lie in both directions:
async chaining under-reports, per-step value fetches add a full tunnel
round-trip (~40-90 ms). This measures wall(chain K steps -> float(loss))
for several K; the *slope* d wall / dK is the true per-step device time,
with the round-trip and dispatch overheads in the intercept.

Usage: python tools/step_time_slope.py [batch] [Ks, default 4,16,48]
           [--height H --width W] [dotted.overrides=...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnmnet_tpu.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import numpy as np

from cnmnet_tpu.config import Config, apply_overrides
from cnmnet_tpu.train.loop import make_train_step
from cnmnet_tpu.train.state import create_train_state
from __graft_entry__ import _tiny_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=2)
    ap.add_argument("ks", nargs="?", default="4,16,48")
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("overrides", nargs="*", default=[])
    args = ap.parse_args()
    batch_size = args.batch
    ks = [int(k) for k in args.ks.split(",")]
    cfg = apply_overrides(
        Config(),
        [
            f"dataset.batch_size={batch_size}",
            f"dataset.image_height={args.height}",
            f"dataset.image_width={args.width}",
            "model.num_planes=64",
            "model.compute_dtype=bfloat16",
        ]
        + args.overrides,
    )
    batch = _tiny_batch(batch_size, height=args.height, width=args.width)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    batch = jax.device_put(batch)

    # compile + settle
    state, metrics = step(state, batch)
    float(metrics["loss"])

    results = []
    for k in ks:
        t0 = time.monotonic()
        for _ in range(k):
            state, metrics = step(state, batch)
        loss = float(metrics["loss"])  # forces the whole chain
        dt = time.monotonic() - t0
        results.append((k, dt))
        print(f"K={k:3d}: {dt:7.3f} s total, loss {loss:.4f}", flush=True)

    (k1, t1), (k2, t2) = results[-2], results[-1]
    slope = (t2 - t1) / (k2 - k1)
    print(
        f"slope: {slope * 1e3:.1f} ms/step "
        f"({batch_size / slope:.1f} samples/s/chip, batch {batch_size}); "
        f"intercept ~{(t1 - slope * k1) * 1e3:.0f} ms"
    )


if __name__ == "__main__":
    main()
