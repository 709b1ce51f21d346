"""Import a reference (PyTorch) CNMNet checkpoint into this framework.

The reference ships a Google-Drive checkpoint saved as
``{'depth_network_state_dict': ..., 'depth_refine_network_state_dict': ...}``
(`train.py:402-410`), with torch Sequential naming:

  depthNet:  conv1..conv5   -> Sequential(Conv2d, BN, ReLU, Conv2d, BN, ReLU)
             upconv5..1     -> Sequential(Upsample, Conv2d, BN, ReLU)
             iconv5..1      -> Sequential(Conv2d, BN, ReLU)
             disp1..disp4   -> Sequential(Conv2d(bias), Sigmoid)
  DepthRefineNet: conv1..3, {upconv,iconv}{3,2,1}_{depth,prob}, disp_refine, prob

This tool maps those tensors into the flax param/batch_stats tree of
:class:`cnmnet_tpu.models.CNMModel` (OIHW -> HWIO kernel transpose, BN
weight/bias -> scale/bias, running stats -> batch_stats) and writes an orbax
checkpoint ready for eval/visualize/fine-tuning.

Usage:
  python tools/import_torch_checkpoint.py --torch-ckpt model.pt \
      --out checkpoints_imported [--idepth-scale 3.0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _strip_module(state_dict: dict) -> dict:
    """Remove DataParallel's 'module.' prefix (`eval.py:188-196`)."""
    return {
        (k[7:] if k.startswith("module.") else k): v for k, v in state_dict.items()
    }


# torch prefix -> (flax module path in DepthNet, seq index of conv, of BN)
def _depthnet_layout():
    layout = []
    for i in range(5):  # conv1..conv5 -> DownConvBlock_0..4 (two conv+BN each)
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            layout.append(
                (f"conv{i+1}", ci, bi,
                 f"DownConvBlock_{i}/ConvNormAct_{j}")
            )
    # decoder interleaving (call order defines flax auto-names):
    # upconv5 iconv5 upconv4 iconv4 disp4 upconv3 iconv3 disp3 ...
    ups = ["upconv5", "upconv4", "upconv3", "upconv2", "upconv1"]
    ics = ["iconv5", "iconv4", "iconv3", "iconv2", "iconv1"]
    for k in range(5):
        layout.append((ups[k], 1, 2, f"UpConvBlock_{k}/ConvNormAct_0"))
        layout.append((ics[k], 0, 1, f"ConvNormAct_{k}"))
    return layout


def _refinenet_layout():
    layout = []
    for i in range(3):
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            layout.append(
                (f"conv{i+1}", ci, bi, f"DownConvBlock_{i}/ConvNormAct_{j}")
            )
    for branch, tag in (("depth_branch", "depth"), ("prob_branch", "prob")):
        for k, lvl in enumerate((3, 2, 1)):
            layout.append(
                (f"upconv{lvl}_{tag}", 1, 2,
                 f"{branch}/UpConvBlock_{k}/ConvNormAct_0")
            )
            layout.append(
                (f"iconv{lvl}_{tag}", 0, 1, f"{branch}/ConvNormAct_{k}")
            )
    return layout


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        raise KeyError(f"missing leaf {path}")
    if tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {path}: {node[leaf].shape} vs {value.shape}"
        )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def _convert_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_net(sd: dict, layout, params: dict, stats: dict, net_key: str,
                disp_heads=None):
    """Fill params/batch_stats sub-trees for one network in place."""
    sd = _strip_module(sd)
    for torch_prefix, ci, bi, flax_path in layout:
        _set(params[net_key], f"{flax_path}/Conv_0/kernel",
             _convert_conv(np.asarray(sd[f"{torch_prefix}.{ci}.weight"])))
        _set(params[net_key], f"{flax_path}/BatchNorm_0/scale",
             np.asarray(sd[f"{torch_prefix}.{bi}.weight"]))
        _set(params[net_key], f"{flax_path}/BatchNorm_0/bias",
             np.asarray(sd[f"{torch_prefix}.{bi}.bias"]))
        _set(stats[net_key], f"{flax_path}/BatchNorm_0/mean",
             np.asarray(sd[f"{torch_prefix}.{bi}.running_mean"]))
        _set(stats[net_key], f"{flax_path}/BatchNorm_0/var",
             np.asarray(sd[f"{torch_prefix}.{bi}.running_var"]))
    for torch_prefix, flax_path in (disp_heads or []):
        _set(params[net_key], f"{flax_path}/Conv_0/kernel",
             _convert_conv(np.asarray(sd[f"{torch_prefix}.0.weight"])))
        _set(params[net_key], f"{flax_path}/Conv_0/bias",
             np.asarray(sd[f"{torch_prefix}.0.bias"]))


DEPTHNET_DISP_HEADS = [
    ("disp4", "DispHead_0"),
    ("disp3", "DispHead_1"),
    ("disp2", "DispHead_2"),
    ("disp1", "DispHead_3"),
]
REFINENET_DISP_HEADS = [
    ("disp_refine", "depth_branch/DispHead_0"),
    ("prob", "prob_branch/DispHead_0"),
]


def import_checkpoint(torch_ckpt: dict, cfg=None):
    """torch checkpoint dict -> (params, batch_stats) numpy trees."""
    import jax

    from cnmnet_tpu.config import Config
    from cnmnet_tpu.data.pipeline import collate, normalize_images
    from cnmnet_tpu.data.synthetic import SyntheticScenes
    from cnmnet_tpu.train.state import build_model

    cfg = cfg or Config()
    model = build_model(cfg)
    ds = SyntheticScenes(num_samples=1, height=cfg.dataset.image_height,
                         width=cfg.dataset.image_width, view_num=3)
    batch = collate([{k: v for k, v in ds[0].items() if k != "index"}])
    batch["images"] = normalize_images(batch["images"])
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["cams"], train=False
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    # flax FrozenDict/immutable: convert to plain nested dicts
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)
    stats = flax.core.unfreeze(stats) if hasattr(flax.core, "unfreeze") else dict(stats)

    convert_net(
        torch_ckpt["depth_network_state_dict"], _depthnet_layout(),
        params, stats, "depth_net", DEPTHNET_DISP_HEADS,
    )
    if "depth_refine_network_state_dict" in torch_ckpt:
        convert_net(
            torch_ckpt["depth_refine_network_state_dict"], _refinenet_layout(),
            params, stats, "refine_net", REFINENET_DISP_HEADS,
        )
    return params, stats


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--idepth-scale", type=float, default=3.0)
    args = p.parse_args(argv)

    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    ckpt = {
        k: ({kk: vv.numpy() for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in ckpt.items()
    }

    import jax

    from cnmnet_tpu.config import Config
    from cnmnet_tpu.data.pipeline import collate, normalize_images
    from cnmnet_tpu.data.synthetic import SyntheticScenes
    from cnmnet_tpu.train.checkpoint import CheckpointManager
    from cnmnet_tpu.train.state import create_train_state

    cfg = Config()
    cfg.model.idepth_scale = args.idepth_scale
    params, stats = import_checkpoint(ckpt, cfg)

    ds = SyntheticScenes(num_samples=1, height=cfg.dataset.image_height,
                         width=cfg.dataset.image_width, view_num=3)
    batch = collate([{k: v for k, v in ds[0].items() if k != "index"}])
    batch["images"] = normalize_images(batch["images"])
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = state.replace(params=params, batch_stats=stats)
    mgr = CheckpointManager(args.out)
    mgr.save(state, step=int(ckpt.get("global_step", 0)))
    mgr.wait()
    print(f"imported checkpoint -> {args.out} (step {int(ckpt.get('global_step', 0))})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
