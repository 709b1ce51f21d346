"""Sanity check: depth->normal operator vs ground-truth normal maps.

Counterpart of the reference's `data_prepare/check_gt_normal.py:9-33` — its
only golden-value script. Runs the framework's depth->normal on GT depth and
prints the mean angular error against the GT normal map.

Usage:
  python tools/check_gt_normal.py                 # procedural synthetic data
  python tools/check_gt_normal.py --scannet ROOT LIST  # real samples
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scannet", nargs=2, metavar=("ROOT", "LIST"), default=None)
    p.add_argument("--k-size", type=int, default=9)
    p.add_argument("--num-samples", type=int, default=4)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from cnmnet_tpu.geometry.camera import invert_intrinsics
    from cnmnet_tpu.kernels import dispatch
    from cnmnet_tpu.ops.normals import normal_mean_angle_deg

    if args.scannet:
        from cnmnet_tpu.data.scannet import ScanNetDataset

        ds = ScanNetDataset(
            list_filepath=args.scannet[1], root_dir=args.scannet[0]
        )
    else:
        from cnmnet_tpu.data.synthetic import SyntheticScenes

        ds = SyntheticScenes(num_samples=args.num_samples, height=192, width=256)

    angles = []
    for i in range(min(args.num_samples, len(ds))):
        s = ds[i]
        depth = jnp.asarray(np.asarray(s["depths"][0]))[None]
        K = jnp.asarray(np.asarray(s["cams"][0, 1, :3, :3]))[None]
        n, _ = dispatch.depth_to_normal(depth, invert_intrinsics(K), args.k_size)
        valid = depth > 0.1
        ang = normal_mean_angle_deg(n, jnp.asarray(s["normals"])[None], valid)
        angles.append(float(ang))
        print(f"sample {i}: mean angle {angles[-1]:.2f} deg")
    print(f"overall mean angle: {np.mean(angles):.2f} deg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
