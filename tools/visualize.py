"""Render prediction panels (rgb | gt depth | pred depth | pred normal |
prob map) from a checkpoint to PNG files.

Usage:
  python tools/visualize.py --checkpoint checkpoints_synth --out /tmp/viz \
      [--samples 2] [--synthetic] [--scannet ROOT LIST]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--samples", type=int, default=2)
    p.add_argument("--scannet", nargs=2, metavar=("ROOT", "LIST"), default=None)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from cnmnet_tpu.cache import enable_compilation_cache

    enable_compilation_cache()

    from cnmnet_tpu.config import Config
    from cnmnet_tpu.data.pipeline import collate, denormalize_images, normalize_images
    from cnmnet_tpu.geometry.camera import invert_intrinsics
    from cnmnet_tpu.kernels import dispatch
    from cnmnet_tpu.obs.colorize import colorize_depth, colorize_prob, normal_to_color
    from cnmnet_tpu.train.checkpoint import CheckpointManager
    from cnmnet_tpu.train.state import build_model, create_train_state

    cfg = Config()
    cfg.dataset.image_height = args.height
    cfg.dataset.image_width = args.width
    if args.bf16:
        cfg.model.compute_dtype = "bfloat16"

    if args.scannet:
        from cnmnet_tpu.data.scannet import ScanNetDataset

        ds = ScanNetDataset(
            list_filepath=args.scannet[1], root_dir=args.scannet[0],
            image_height=args.height, image_width=args.width,
        )
    else:
        from cnmnet_tpu.data.synthetic import SyntheticScenes

        ds = SyntheticScenes(
            num_samples=max(args.samples, 1) + 60,
            height=args.height, width=args.width, view_num=3,
        )

    samples = []
    for i in range(args.samples):
        s = {k: v for k, v in ds[60 + i].items() if k != "index"} if not args.scannet \
            else {k: v for k, v in ds[i].items() if k != "index"}
        samples.append(s)
    batch = collate(samples)
    if not args.scannet:
        batch["images"] = normalize_images(batch["images"])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(args.checkpoint)
    restored = mgr.restore("latest", state)
    if restored is None:
        print(f"no checkpoint found in {args.checkpoint}")
        return 1
    state = restored
    print(f"restored step {int(state.step)}")

    model = build_model(cfg)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"], batch["cams"], train=False,
    )
    pred_depth = 1.0 / (out.idepth_refined[..., 0] + 1e-8)
    K_inv = invert_intrinsics(batch["cams"][:, 0, 1, :3, :3])
    normals, _ = dispatch.depth_to_normal(pred_depth, K_inv, cfg.model.k_size)

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.samples):
        rgb = np.clip(denormalize_images(np.asarray(batch["images"][i, 0])), 0, 1)
        panels = [
            (rgb * 255).astype(np.uint8),
            colorize_depth(np.asarray(batch["depths"][i, 0])),
            colorize_depth(np.asarray(pred_depth[i])),
            normal_to_color(np.asarray(normals[i])),
            colorize_prob(np.asarray(out.prob_map[i, ..., 0])),
        ]
        panel = np.concatenate(panels, axis=1)
        path = os.path.join(args.out, f"sample_{i}.png")
        Image.fromarray(panel).save(path)
        print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
