"""TPU wall-clock for depth->normal: fused Pallas kernel vs jnp conv impl.

Run on the real chip: python tools/bench_normals.py [B H W k iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cnmnet_tpu.cache import enable_compilation_cache

enable_compilation_cache()

from cnmnet_tpu.geometry.camera import invert_intrinsics
from cnmnet_tpu.kernels.normals_pallas import depth_to_normal_pallas
from cnmnet_tpu.ops.normals import depth_to_normal


def main():
    args = sys.argv[1:]
    B = int(args[0]) if len(args) > 0 else 4
    H = int(args[1]) if len(args) > 1 else 192
    W = int(args[2]) if len(args) > 2 else 256
    k = int(args[3]) if len(args) > 3 else 9
    iters = int(args[4]) if len(args) > 4 else 50

    # smooth scene-like depth (real depth maps are piecewise smooth; iid
    # noise at realistic focals makes the uncentered fit ill-conditioned
    # for every f32 implementation, including the torch reference)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = jnp.asarray(
        2.0
        + 0.5 * np.sin(2 * np.pi * xx[None] / W * 3)
        + 0.3 * np.cos(2 * np.pi * yy[None] / H * 2)
        + np.linspace(0, 0.5, B, dtype=np.float32)[:, None, None],
        jnp.float32,
    )
    K = jnp.asarray([[290.0, 0, W / 2], [0, 290.0, H / 2], [0, 0, 1]])
    K_inv = jnp.broadcast_to(invert_intrinsics(K), (B, 3, 3))
    depth = jax.device_put(depth)
    K_inv = jax.device_put(K_inv)

    jnp_fn = jax.jit(lambda d, ki: depth_to_normal(d, ki, k)[0])
    pallas_fn = jax.jit(lambda d, ki: depth_to_normal_pallas(d, ki, k)[0])

    for name, fn in [("jnp", jnp_fn), ("pallas", pallas_fn)]:
        out = jax.block_until_ready(fn(depth, K_inv))  # compile
        t0 = time.monotonic()
        for _ in range(iters):
            out = jax.block_until_ready(fn(depth, K_inv))
        dt = (time.monotonic() - t0) / iters
        print(f"{name:7s} {B}x{H}x{W} k={k}: {dt * 1e3:.3f} ms "
              f"({B / dt:.1f} maps/s)")

    a = np.asarray(jnp_fn(depth, K_inv))
    b = np.asarray(pallas_fn(depth, K_inv))
    cos = (a * b).sum(-1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-12
    )
    ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    print(f"angular agreement: max {ang.max():.4f} mean {ang.mean():.6f} deg")


if __name__ == "__main__":
    main()
