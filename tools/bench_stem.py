"""Micro-benchmark of the DepthNet stem conv (the round-1 profile hotspot).

The first conv — concat(rgb[3], volume[64]) -> 128 features, k7 s1 at
192x256 — measured ~1.9 ms at ~23% MXU in the round-1 device trace
(RESULTS.md), the single largest op of the forward. This tool times
candidate rewrites on the real chip, all mathematically exact w.r.t. the
reference layer (`depthNet_model.py:233` concats rgb first, then volume):

  joint      concat(rgb, vol) -> conv67->128        (current model)
  joint_vf   concat(vol, rgb) -> conv67->128        (volume lane-aligned)
  split      conv(vol, W[:,:,3:]) + conv(rgb, W[:,:,:3])  (linearity: exact)
  pad128     concat zero-padded to 128 ch -> conv128->128 (alignment probe;
             extra lanes multiply zeros, exact)
  vol64      conv(vol) only                          (diagnostic lower bound)
  block0     full DownConvBlock_0 (s1 conv + BN + relu + s2 conv + BN + relu)

Each variant is its own jit program (the persistent cache makes reruns
cheap). BN(eval)+relu is fused after every stem variant for realism.

Usage: python tools/bench_stem.py [--variants joint,split,...] [--iters 50]
Prints one JSON line per variant: {"variant", "ms", "fps_equiv"}.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="joint,joint_vf,split,pad128,vol64,block0")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--batch", type=int, default=2)  # 2 = the folded 3-view pass
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    args = p.parse_args(argv)

    from cnmnet_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    B, H, W = args.batch, args.height, args.width
    rgb = jnp.asarray(rng.randn(B, H, W, 3), jnp.bfloat16)
    vol = jnp.asarray(rng.randn(B, H, W, 64), jnp.bfloat16)
    Wk = jnp.asarray(rng.randn(7, 7, 67, 128) * 0.05, jnp.bfloat16)
    Wk2 = jnp.asarray(rng.randn(7, 7, 128, 128) * 0.05, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(128) + 0.5, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(128), jnp.bfloat16)

    def conv(x, w, stride=1):
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        p_ = (w.shape[0] - 1) // 2
        return lax.conv_general_dilated(
            x, w, (stride, stride), [(p_, p_), (p_, p_)], dimension_numbers=dn
        )

    def bn_relu(x):
        return jnp.maximum(x * scale + bias, 0)

    @jax.jit
    def joint(rgb, vol):
        return bn_relu(conv(jnp.concatenate([rgb, vol], -1), Wk))

    @jax.jit
    def joint_vf(rgb, vol):
        w = jnp.concatenate([Wk[:, :, 3:], Wk[:, :, :3]], axis=2)
        return bn_relu(conv(jnp.concatenate([vol, rgb], -1), w))

    @jax.jit
    def split(rgb, vol):
        return bn_relu(conv(vol, Wk[:, :, 3:]) + conv(rgb, Wk[:, :, :3]))

    @jax.jit
    def pad128(rgb, vol):
        x = jnp.concatenate(
            [rgb, vol, jnp.zeros((B, H, W, 61), jnp.bfloat16)], -1
        )
        w = jnp.concatenate([Wk, jnp.zeros((7, 7, 61, 128), jnp.bfloat16)], 2)
        return bn_relu(conv(x, w))

    @jax.jit
    def vol64(rgb, vol):
        return bn_relu(conv(vol, Wk[:, :, 3:]))

    @jax.jit
    def block0(rgb, vol):
        x = bn_relu(conv(jnp.concatenate([rgb, vol], -1), Wk))
        return bn_relu(conv(x, Wk2, stride=2))

    fns = dict(joint=joint, joint_vf=joint_vf, split=split, pad128=pad128,
               vol64=vol64, block0=block0)

    ref = None
    for name in args.variants.split(","):
        fn = fns[name]
        out = jax.block_until_ready(fn(rgb, vol))  # compile
        t0 = time.monotonic()
        for _ in range(args.iters):
            out = fn(rgb, vol)
        jax.block_until_ready(out)
        ms = (time.monotonic() - t0) / args.iters * 1e3
        rec = {"variant": name, "ms": round(ms, 4)}
        if name == "joint":
            ref = np.asarray(out, np.float32)
        elif ref is not None and name in ("joint_vf", "split", "pad128"):
            rec["max_diff_vs_joint"] = float(
                np.max(np.abs(np.asarray(out, np.float32) - ref))
            )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
