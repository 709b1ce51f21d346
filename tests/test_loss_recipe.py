"""Recipe-level tests of compute_losses with hand-built model outputs
(no networks — fast, targeted at the branch/gate logic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.models.cnm import CNMOutputs
from cnmnet_tpu.train.losses import LossWeights, compute_losses


H, W, B, S = 16, 24, 2, 2


def mock_batch(rng):
    depth = 2.0 + 0.1 * rng.standard_normal((B, 3, H, W)).astype(np.float32)
    cams = np.zeros((B, 3, 2, 4, 4), np.float32)
    for b in range(B):
        for v in range(3):
            cams[b, v, 0] = np.eye(4)
            cams[b, v, 0, 0, 3] = 0.05 * v
            cams[b, v, 1, :3, :3] = np.asarray(
                [[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]]
            )
    return {
        "images": jnp.zeros((B, 3, H, W, 3)),
        "cams": jnp.asarray(cams),
        "depths": jnp.asarray(depth),
        "disparity": jnp.asarray(1.0 / depth[:, 0]),
        "normals": jnp.asarray(
            np.tile([0.0, 0.0, 1.0], (B, H, W, 1)).astype(np.float32)
        ),
        "instance_segs": jnp.zeros((B, 20, H, W)),
        "planes_num": jnp.zeros((B,), jnp.int32),
    }


def mock_outputs(rng, idepth_value=0.5, refined=True):
    d1 = jnp.full((B, S, H, W, 1), idepth_value)
    disps = [d1, d1[:, :, ::2, ::2], d1[:, :, ::4, ::4], d1[:, :, ::8, ::8]]
    iconv = jnp.zeros((B, S, H, W, 64))
    if not refined:
        return CNMOutputs(disps, iconv, None, None, None, None)
    ir = jnp.full((B, H, W, 1), idepth_value)
    prob = jnp.full((B, H, W, 1), 0.8)
    return CNMOutputs(disps, iconv, ir, ir, ir, prob)


class TestRecipes:
    def test_perfect_prediction_low_loss(self, rng):
        batch = mock_batch(rng)
        # idepth exactly 1/depth would need spatial structure; use the mean
        out = mock_outputs(rng, idepth_value=0.5)
        loss, m = compute_losses(out, batch, jnp.asarray(0), LossWeights(k_size=5))
        assert np.isfinite(float(loss))
        # prob_loss_minusmean = 1 - 0.8
        assert float(m["prob_loss_minusmean"]) == pytest.approx(0.2, abs=1e-4)

    def test_nan_normal_guard_drops_normal_terms(self, rng):
        """NaN depths poison the normal losses; the guard must keep the
        total finite and equal to the base + warped terms."""
        batch = mock_batch(rng)
        batch["normals"] = batch["normals"].at[...].set(jnp.nan)
        out = mock_outputs(rng)
        loss, m = compute_losses(out, batch, jnp.asarray(0), LossWeights(k_size=5))
        # surface_normal_loss sanitizes NaN gt -> masked -> loss 0, so the
        # guard path itself stays finite either way
        assert np.isfinite(float(loss))

    def test_include_prob_map_loss_switch(self, rng):
        batch = mock_batch(rng)
        out = mock_outputs(rng)
        w0 = LossWeights(k_size=5, include_prob_map_loss=False)
        w1 = LossWeights(k_size=5, include_prob_map_loss=True)
        l0, m0 = compute_losses(out, batch, jnp.asarray(0), w0)
        l1, m1 = compute_losses(out, batch, jnp.asarray(0), w1)
        assert float(l1) == pytest.approx(
            float(l0) + float(m0["prob_map_loss"]), rel=1e-5
        )

    def test_refinerless_recipe(self, rng):
        batch = mock_batch(rng)
        out = mock_outputs(rng, refined=False)
        loss, m = compute_losses(out, batch, jnp.asarray(0), LossWeights(k_size=5))
        assert np.isfinite(float(loss))
        assert "prob_loss" not in m and "loss_idepth_refined" not in m

    def test_wo_normal_gate_values(self, rng):
        batch = mock_batch(rng)
        out = mock_outputs(rng)
        w = LossWeights(use_normal_loss=False, curriculum_epochs=5)
        l_early, m_early = compute_losses(out, batch, jnp.asarray(2), w)
        l_late, m_late = compute_losses(out, batch, jnp.asarray(7), w)
        expected_early = (
            float(m_early["loss_idepth"])
            + float(m_early["loss_idepth_234"])
            + float(m_early["loss_idepth_refined"])
        )
        assert float(l_early) == pytest.approx(expected_early, rel=1e-5)
        assert float(l_late) > float(l_early)

    def test_normal_target_switch(self, rng):
        """use_normal_refined_by_planes toggles the CNM target; with planes
        present the two targets differ."""
        batch = mock_batch(rng)
        segs = np.zeros((B, 20, H, W), np.float32)
        segs[:, 0, : H // 2] = 1.0
        batch["instance_segs"] = jnp.asarray(segs)
        batch["planes_num"] = jnp.ones((B,), jnp.int32)
        # non-uniform gt normals so plane averaging changes the target
        n = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        batch["normals"] = jnp.asarray(n)
        out = mock_outputs(rng)
        w_cnm = LossWeights(k_size=5, use_normal_refined_by_planes=True)
        w_raw = LossWeights(k_size=5, use_normal_refined_by_planes=False)
        _, m_cnm = compute_losses(out, batch, jnp.asarray(0), w_cnm)
        _, m_raw = compute_losses(out, batch, jnp.asarray(0), w_raw)
        assert float(m_cnm["loss_normal_depth"]) != pytest.approx(
            float(m_raw["loss_normal_depth"]), rel=1e-4
        )
