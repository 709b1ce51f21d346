"""Reference-checkpoint importer tests.

Builds a synthetic torch-format state dict (correct Sequential key names and
shapes, derived by inverting the mapping against our own param tree) and
verifies the converter places every tensor, transposed correctly, into the
flax tree — the real Google-Drive checkpoint then imports by construction.
"""

import numpy as np
import pytest

from cnmnet_tpu.config import Config

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.import_torch_checkpoint import (
    DEPTHNET_DISP_HEADS,
    REFINENET_DISP_HEADS,
    _depthnet_layout,
    _refinenet_layout,
    import_checkpoint,
)


def _get(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node)


def _make_torch_sd(params, stats, net_key, layout, heads, rng):
    """Random torch-format state dict with shapes matching our tree."""
    sd = {}
    for torch_prefix, ci, bi, flax_path in layout:
        k = _get(params[net_key], f"{flax_path}/Conv_0/kernel")  # HWIO
        sd[f"{torch_prefix}.{ci}.weight"] = rng.standard_normal(
            (k.shape[3], k.shape[2], k.shape[0], k.shape[1])
        ).astype(np.float32)  # OIHW
        c = k.shape[3]
        sd[f"{torch_prefix}.{bi}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{torch_prefix}.{bi}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{torch_prefix}.{bi}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{torch_prefix}.{bi}.running_var"] = np.abs(
            rng.standard_normal(c)
        ).astype(np.float32)
    for torch_prefix, flax_path in heads:
        k = _get(params[net_key], f"{flax_path}/Conv_0/kernel")
        sd[f"{torch_prefix}.0.weight"] = rng.standard_normal(
            (k.shape[3], k.shape[2], k.shape[0], k.shape[1])
        ).astype(np.float32)
        sd[f"{torch_prefix}.0.bias"] = rng.standard_normal(k.shape[3]).astype(
            np.float32
        )
    return sd


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    cfg.dataset.image_height = 32
    cfg.dataset.image_width = 64
    cfg.model.num_planes = 8
    cfg.model.k_size = 5
    return cfg


class TestImport:
    def test_full_roundtrip(self, small_cfg, rng):
        import jax

        from cnmnet_tpu.data.pipeline import collate, normalize_images
        from cnmnet_tpu.data.synthetic import SyntheticScenes
        from cnmnet_tpu.train.state import build_model

        # reference tree to derive shapes
        model = build_model(small_cfg)
        ds = SyntheticScenes(num_samples=1, height=32, width=64, view_num=3)
        batch = collate([{k: v for k, v in ds[0].items() if k != "index"}])
        batch["images"] = normalize_images(batch["images"])
        variables = model.init(
            jax.random.PRNGKey(0), batch["images"], batch["cams"], train=False
        )
        p0 = jax.tree_util.tree_map(np.asarray, variables["params"])
        s0 = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

        sd_depth = _make_torch_sd(
            p0, s0, "depth_net", _depthnet_layout(), DEPTHNET_DISP_HEADS, rng
        )
        sd_refine = _make_torch_sd(
            p0, s0, "refine_net", _refinenet_layout(), REFINENET_DISP_HEADS, rng
        )
        # DataParallel-style 'module.' prefixes must be stripped
        sd_depth = {"module." + k: v for k, v in sd_depth.items()}

        params, stats = import_checkpoint(
            {
                "depth_network_state_dict": sd_depth,
                "depth_refine_network_state_dict": sd_refine,
            },
            small_cfg,
        )

        # spot-check transposition + placement on first and last layers
        w = sd_depth["module.conv1.0.weight"]
        got = _get(params["depth_net"], "DownConvBlock_0/ConvNormAct_0/Conv_0/kernel")
        np.testing.assert_array_equal(got, np.transpose(w, (2, 3, 1, 0)))

        w = sd_depth["module.disp1.0.weight"]
        got = _get(params["depth_net"], "DispHead_3/Conv_0/kernel")
        np.testing.assert_array_equal(got, np.transpose(w, (2, 3, 1, 0)))

        np.testing.assert_array_equal(
            _get(stats["depth_net"], "DownConvBlock_2/ConvNormAct_1/BatchNorm_0/mean"),
            sd_depth["module.conv3.4.running_mean"],
        )
        np.testing.assert_array_equal(
            _get(params["refine_net"], "prob_branch/DispHead_0/Conv_0/bias"),
            sd_refine["prob.0.bias"],
        )

        # every conv/BN tensor in the tree must have been overwritten
        # (imported values differ from init with overwhelming probability)
        changed = 0
        total = 0
        for path_leaf, init_leaf in zip(
            jax.tree_util.tree_leaves_with_path(p0["depth_net"]),
            jax.tree_util.tree_leaves_with_path(params["depth_net"]),
        ):
            total += 1
            if not np.array_equal(path_leaf[1], init_leaf[1]):
                changed += 1
        assert changed == total, f"{changed}/{total} depth_net leaves imported"

    def test_shape_mismatch_raises(self, small_cfg, rng):
        sd = {"conv1.0.weight": np.zeros((8, 8, 3, 3), np.float32)}
        with pytest.raises((ValueError, KeyError)):
            import_checkpoint({"depth_network_state_dict": sd}, small_cfg)
