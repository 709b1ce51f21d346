"""CNM plane-averaging tests, including a sequential-update oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.ops import normal_by_planes, plane_consistency_loss
from cnmnet_tpu.ops.planes import plane_average_normals


def np_normal_by_planes_oracle(normals, segs, planes_num):
    """Sequential in-place update as in `depth_util.py:259-277`."""
    out = normals.copy()
    for b in range(normals.shape[0]):
        for i in range(planes_num[b]):
            mask = segs[b, i] > 0
            if mask.sum() == 0:
                continue
            mean = normals[b][mask].sum(0) / mask.sum()
            out[b][mask] = mean
    return out


class TestNormalByPlanes:
    def test_matches_sequential_oracle(self, rng):
        B, S, H, W = 2, 20, 8, 8
        normals = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        labels = rng.integers(0, 4, (B, H, W))
        segs = np.zeros((B, S, H, W), np.float32)
        for b in range(B):
            for i in range(3):
                segs[b, i] = labels[b] == i
        planes_num = np.asarray([3, 2])
        got = np.asarray(
            normal_by_planes(
                jnp.asarray(normals), jnp.asarray(segs), jnp.asarray(planes_num)
            )
        )
        want = np_normal_by_planes_oracle(normals, segs, planes_num)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_uncovered_pixels_untouched(self, rng):
        B, S, H, W = 1, 20, 4, 4
        normals = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        segs = np.zeros((B, S, H, W), np.float32)
        segs[0, 0, :2, :2] = 1.0
        got = np.asarray(
            normal_by_planes(jnp.asarray(normals), jnp.asarray(segs), jnp.asarray([1]))
        )
        np.testing.assert_allclose(got[0, 2:, 2:], normals[0, 2:, 2:], atol=0)
        mean = normals[0, :2, :2].reshape(-1, 3).mean(0)
        np.testing.assert_allclose(got[0, 0, 0], mean, atol=1e-6)

    def test_inactive_slots_ignored(self, rng):
        B, S, H, W = 1, 20, 4, 4
        normals = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        segs = np.zeros((B, S, H, W), np.float32)
        segs[0, 5] = 1.0  # slot beyond planes_num must be ignored
        got = np.asarray(
            normal_by_planes(jnp.asarray(normals), jnp.asarray(segs), jnp.asarray([1]))
        )
        np.testing.assert_allclose(got, normals, atol=0)


class TestConsistencyLoss:
    def test_uniform_plane_zero_loss(self):
        B, S, H, W = 1, 20, 4, 4
        normals = np.tile([0.0, 0.0, 1.0], (B, H, W, 1)).astype(np.float32)
        segs = np.zeros((B, S, H, W), np.float32)
        segs[0, 0] = 1.0
        loss = plane_consistency_loss(
            jnp.asarray(normals), jnp.asarray(segs), jnp.asarray([1])
        )
        assert float(loss[0]) == pytest.approx(0.0, abs=1e-5)

    def test_split_plane_positive_loss(self):
        B, S, H, W = 1, 20, 4, 4
        normals = np.tile([0.0, 0.0, 1.0], (B, H, W, 1)).astype(np.float32)
        normals[0, :2] = [1.0, 0.0, 0.0]
        segs = np.zeros((B, S, H, W), np.float32)
        segs[0, 0] = 1.0
        loss = plane_consistency_loss(
            jnp.asarray(normals), jnp.asarray(segs), jnp.asarray([1])
        )
        assert float(loss[0]) > 0.1


class TestMeans:
    def test_means_shape_and_value(self, rng):
        B, S, H, W = 1, 20, 4, 4
        normals = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        segs = np.zeros((B, S, H, W), np.float32)
        segs[0, 0, 0] = 1.0  # first row
        _, means, m = plane_average_normals(
            jnp.asarray(normals), jnp.asarray(segs), jnp.asarray([1])
        )
        assert means.shape == (B, S, 3)
        np.testing.assert_allclose(
            np.asarray(means)[0, 0], normals[0, 0].mean(0), atol=1e-6
        )
