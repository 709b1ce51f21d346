"""Backward-lever sweep: chain-slope ms/step for train-step variants.

ROADMAP 6 / round-3 VERDICT item 2: the backward is ~1.6x the forward and
is the declared remaining perf lever. This sweeps the controllable knobs in
one run (each variant is its own compile — budget accordingly on a cold
cache) and prints a table of true per-step device time (chain-slope; see
tools/step_time_slope.py for why wall clocks lie here) plus compiled FLOPs,
so wins and walls are both documented with evidence.

Variants:
  base        bf16 compute, no remat (the RESULTS.md configuration)
  remat       rematerialized DepthNet encoder (FLOPs for memory/locality)
  no_normals  normal losses off — isolates the 3x depth_to_normal fwd+bwd
  k5          k_size=5 stencil — isolates the box-filter radius cost
  f32         float32 compute — the MXU bf16 speedup check

Usage: python tools/bwd_probe.py [--batch 8] [--variants base,remat,...]
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
import numpy as np

from cnmnet_tpu.config import Config, apply_overrides
from cnmnet_tpu.train.loop import make_train_step
from cnmnet_tpu.train.state import create_train_state
from __graft_entry__ import _tiny_batch

VARIANTS = {
    "base": [],
    "remat": ["model.remat=true"],
    # selective remat (round-4): checkpoint only the N high-resolution
    # encoder stages — most of the activation memory, a fraction of the
    # re-FLOPs (model.remat_stages)
    "remat1": ["model.remat=true", "model.remat_stages=1"],
    "remat2": ["model.remat=true", "model.remat_stages=2"],
    "remat3": ["model.remat=true", "model.remat_stages=3"],
    # + RefineNet remat: the native-res batch-4 OOM is a refiner fusion temp
    "rematr": [
        "model.remat=true", "model.remat_stages=2", "model.remat_refiner=true"
    ],
    "rematfr": ["model.remat=true", "model.remat_refiner=true"],
    "no_normals": ["train.use_normal_loss=false"],
    "k5": ["model.k_size=5"],
    "f32": ["model.compute_dtype=float32"],
    "s2d": ["model.stride2=s2d"],
    "s2d_remat": ["model.stride2=s2d", "model.remat=true"],
    "psg": ["model.stride2=psg"],
    "psg_remat": ["model.stride2=psg", "model.remat=true"],
}


def slope_ms(step, state, batch, ks=(4, 16, 48)):
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
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    print("| variant | GFLOP | ms/step | samples/s/chip |\n|---|---|---|---|")
    for name in args.variants.split(","):
        overrides = [
            f"dataset.batch_size={args.batch}",
            "model.num_planes=64",
            "model.compute_dtype=bfloat16",
        ] + VARIANTS[name.strip()]
        cfg = apply_overrides(Config(), overrides)
        batch = _tiny_batch(args.batch, height=args.height, width=args.width)
        batch = {k: jax.device_put(jax.numpy.asarray(v)) for k, v in batch.items()}
        state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        step = make_train_step(cfg)
        ca = step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gflop = float(ca.get("flops", 0.0)) / 1e9
        ms = slope_ms(step, state, batch)
        print(
            f"| {name} | {gflop:.0f} | {ms:.1f} | {args.batch / ms * 1e3:.1f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
