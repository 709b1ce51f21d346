"""Loss golden-value tests against tiny numpy fixtures."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.ops.losses import (
    masked_l1,
    multiscale_idepth_loss,
    prob_weighted_l1,
    prob_supervision_loss,
    surface_normal_loss,
    warped_depth_loss,
)
from cnmnet_tpu.geometry import invert_intrinsics
from tests.test_geometry import make_K


class TestMaskedL1:
    def test_basic(self):
        pred = jnp.asarray([[1.0, 2.0, 3.0, 4.0]]).reshape(1, 2, 2, 1)
        gt = jnp.asarray([[1.5, 0.0, 3.0, 5.0]]).reshape(1, 2, 2, 1)
        # masked pixels: gt>0 -> indices 0, 2, 3 -> diffs 0.5, 0, 1
        assert float(masked_l1(pred, gt)) == pytest.approx(0.5)

    def test_nonfinite_and_nonpositive_excluded(self):
        pred = jnp.asarray([-1.0, 2.0, 3.0]).reshape(1, 1, 3, 1)
        gt = jnp.asarray([1.0, np.inf, 2.0]).reshape(1, 1, 3, 1)
        # only index 2 valid -> |3-2| = 1
        assert float(masked_l1(pred, gt)) == pytest.approx(1.0)

    def test_empty_mask_is_zero_not_nan(self):
        pred = jnp.zeros((1, 2, 2, 1))
        gt = jnp.zeros((1, 2, 2, 1))
        assert float(masked_l1(pred, gt)) == 0.0

    def test_log_mode(self):
        pred = jnp.full((1, 1, 1, 1), 10.0)
        gt = jnp.full((1, 1, 1, 1), 100.0)
        assert float(masked_l1(pred, gt, log=True)) == pytest.approx(1.0, abs=1e-5)


class TestMultiscale:
    def test_weighting(self):
        gt = jnp.ones((1, 8, 8, 1))
        preds = [
            jnp.ones((1, 8, 8, 1)),
            jnp.ones((1, 4, 4, 1)) * 2.0,  # L1 = 1
            jnp.ones((1, 2, 2, 1)) * 2.0,  # L1 = 1
            jnp.ones((1, 1, 1, 1)) * 2.0,  # L1 = 1
        ]
        # 0.1 * (1+1+1)/3 = 0.1
        assert float(multiscale_idepth_loss(preds, gt)) == pytest.approx(0.1)

    def test_nearest_downsample_indices(self):
        gt = jnp.arange(16.0).reshape(1, 4, 4, 1)
        preds = [gt, gt[:, ::2, ::2], gt[:, ::4, ::4], gt[:, ::4, ::4][:, :1, :1]]
        # torch F.interpolate nearest picks input[2i] -> identical -> loss 0
        assert float(multiscale_idepth_loss(preds[:4], gt)) == pytest.approx(0.0)


class TestProbLosses:
    def test_prob_weighted(self):
        pred = jnp.asarray([2.0, 2.0]).reshape(1, 1, 2, 1)
        gt = jnp.asarray([1.0, 3.0]).reshape(1, 1, 2, 1)
        prob = jnp.asarray([1.0, 0.0]).reshape(1, 1, 2, 1)
        # mean over valid of prob * |diff| = (1*1 + 0*1)/2
        assert float(prob_weighted_l1(pred, gt, prob)) == pytest.approx(0.5)

    def test_prob_supervision(self):
        idepth = jnp.full((1, 2, 2, 1), 1.0)
        gt = jnp.full((1, 2, 2, 1), 1.0)
        prob = jnp.full((1, 2, 2, 1), 1.0)
        loss, prob_gt = prob_supervision_loss(prob, idepth, gt, prob_weight=20.0)
        np.testing.assert_allclose(prob_gt, 1.0)  # perfect -> confidence 1
        assert float(loss) == pytest.approx(0.0)

        gt2 = jnp.full((1, 2, 2, 1), 1.5)
        loss2, prob_gt2 = prob_supervision_loss(prob, idepth, gt2, prob_weight=2.0)
        np.testing.assert_allclose(prob_gt2, np.exp(-1.0), rtol=1e-5)
        assert float(loss2) == pytest.approx(1 - np.exp(-1.0), rel=1e-5)


class TestSurfaceNormalLoss:
    def test_identical_normals(self):
        n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 4, 4, 1))
        loss, ang = surface_normal_loss(n, n, jnp.ones((1, 4, 4), bool))
        assert float(loss) == pytest.approx(0.0, abs=1e-6)
        assert float(ang) == pytest.approx(0.0, abs=1e-2)

    def test_orthogonal_normals(self):
        a = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 4, 4, 1))
        b = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (1, 4, 4, 1))
        loss, ang = surface_normal_loss(a, b, jnp.ones((1, 4, 4), bool))
        assert float(loss) == pytest.approx(1.0, abs=1e-6)
        assert float(ang) == pytest.approx(90.0, abs=1e-3)

    def test_nan_gt_masked(self):
        a = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 2, 2, 1))
        b = a.at[0, 0, 0, 0].set(jnp.nan)
        loss, _ = surface_normal_loss(a, b, jnp.ones((1, 2, 2), bool))
        assert np.isfinite(float(loss))
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_per_sample_reduction_matches_reference_loop(self):
        """The batch reduction must equal the reference's per-sample loop
        (`train.py:226-263`): mean over samples of per-sample masked means —
        NOT a pooled mean over all valid pixels (which weights samples by
        their valid-pixel count)."""
        rng = np.random.default_rng(3)
        pred = rng.standard_normal((3, 4, 5, 3)).astype(np.float32)
        gt = rng.standard_normal((3, 4, 5, 3)).astype(np.float32)
        # ragged valid masks: 18, 5, and 1 valid pixels
        valid = np.zeros((3, 4, 5), bool)
        valid[0].flat[:18] = True
        valid[1].flat[:5] = True
        valid[2].flat[:1] = True
        batched, batched_ang = surface_normal_loss(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid)
        )
        per = [
            surface_normal_loss(
                jnp.asarray(pred[i : i + 1]),
                jnp.asarray(gt[i : i + 1]),
                jnp.asarray(valid[i : i + 1]),
            )
            for i in range(3)
        ]
        loop_loss = np.mean([float(l) for l, _ in per])
        loop_ang = np.mean([float(a) for _, a in per])
        assert float(batched) == pytest.approx(loop_loss, rel=1e-5)
        assert float(batched_ang) == pytest.approx(loop_ang, rel=1e-5)
        # and it must DIFFER from the pooled reduction on ragged masks
        cos = np.sum(pred * gt, -1) / np.maximum(
            np.linalg.norm(pred, axis=-1) * np.linalg.norm(gt, axis=-1), 1e-8
        )
        pooled = np.mean((1.0 - cos)[valid])
        assert float(batched) != pytest.approx(pooled, rel=1e-3)

    def test_empty_sample_yields_nan_like_reference(self):
        """A sample with zero valid pixels NaNs the reference's empty
        masked-select mean; the train loop's guard relies on seeing that."""
        n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (2, 2, 2, 1))
        valid = jnp.asarray([[[True, True], [True, True]], [[False] * 2] * 2])
        loss, ang = surface_normal_loss(n, n, valid)
        assert not np.isfinite(float(loss))
        assert not np.isfinite(float(ang))

    def test_prob_weighted(self):
        a = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1, 1, 2, 1))
        b = jnp.concatenate(
            [
                jnp.asarray([0.0, 0.0, 1.0]).reshape(1, 1, 1, 3),
                jnp.asarray([1.0, 0.0, 0.0]).reshape(1, 1, 1, 3),
            ],
            axis=2,
        )
        w = jnp.asarray([[[3.0, 1.0]]])
        loss, _ = surface_normal_loss(a, b, jnp.ones((1, 1, 2), bool), w)
        # (3*0 + 1*1) / 4
        assert float(loss) == pytest.approx(0.25, abs=1e-6)


class TestWarpedDepthLoss:
    def test_consistent_views_zero_loss(self):
        """Identity pose + identical GT depth -> zero consistency error."""
        H = W = 8
        K = make_K(fx=10.0, fy=10.0, cx=W / 2, cy=H / 2)
        depth = jnp.full((1, H, W), 2.0)
        pose = jnp.eye(4)[None, :3, :]
        loss = warped_depth_loss(depth, depth, pose, K[None], invert_intrinsics(K)[None])
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_shifted_depth_penalized(self):
        H = W = 8
        K = make_K(fx=10.0, fy=10.0, cx=W / 2, cy=H / 2)
        depth = jnp.full((1, H, W), 2.0)
        pose = jnp.eye(4)[None, :3, :]
        loss = warped_depth_loss(
            depth, depth + 0.5, pose, K[None], invert_intrinsics(K)[None]
        )
        assert float(loss) == pytest.approx(0.5, abs=1e-5)

    def test_translation_geometry(self):
        """Pure z-translation toward the scene: src depth = ref depth - tz."""
        H = W = 16
        K = make_K(fx=20.0, fy=20.0, cx=W / 2, cy=H / 2)
        tz = 0.5
        depth = jnp.full((1, H, W), 2.0)
        pose = jnp.concatenate(
            [jnp.eye(3), jnp.asarray([[0.0], [0.0], [tz]])], axis=1
        )[None]
        gt_src = jnp.full((1, H, W), 2.0 + tz)
        loss = warped_depth_loss(depth, gt_src, pose, K[None], invert_intrinsics(K)[None])
        assert float(loss) == pytest.approx(0.0, abs=1e-4)
