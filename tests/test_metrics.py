import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.ops import metrics as M


class TestNumpyMetrics:
    def test_perfect_prediction(self):
        d = np.linspace(0.5, 5.0, 100)
        errs = M.compute_errors(d, d)
        for k in ("l1", "abs_rel", "sq_rel", "rmse", "rmse_log", "scale_inv"):
            assert errs[k] == pytest.approx(0.0, abs=1e-7)
        for k in ("a1", "a2", "a3"):
            assert errs[k] == 1.0

    def test_known_values(self):
        gt = np.asarray([2.0, 2.0])
        pred = np.asarray([2.2, 1.8])
        errs = M.compute_errors(pred, gt)
        assert errs["l1"] == pytest.approx(0.2)
        assert errs["abs_rel"] == pytest.approx(0.1)
        assert errs["sq_rel"] == pytest.approx(0.04 / 2.0)
        assert errs["rmse"] == pytest.approx(0.2)

    def test_ratio_threshold_symmetric(self):
        gt = np.asarray([1.0, 1.0])
        pred = np.asarray([1.2, 1.0 / 1.2])
        assert M.ratio_threshold(gt, pred, 1.25) == 1.0
        assert M.ratio_threshold(gt, pred, 1.1) == 0.0

    def test_valid_mask(self):
        d = np.asarray([0.1, 1.0, 9.0, np.nan, np.inf, 5.0])
        mask = M.compute_valid_depth_mask(d)
        np.testing.assert_array_equal(mask, [False, True, False, False, False, True])

    def test_scale_invariant_shift(self):
        d = np.linspace(1.0, 4.0, 64)
        errs = M.compute_errors(d * 1.5, d)
        assert errs["scale_inv"] == pytest.approx(0.0, abs=1e-6)
        assert errs["abs_rel"] == pytest.approx(0.5, rel=1e-6)


class TestJnpMetrics:
    def test_matches_numpy_pipeline(self, rng):
        gt = rng.uniform(0.2, 9.0, (64, 64)).astype(np.float32)
        pred = (gt * rng.uniform(0.8, 1.25, gt.shape)).astype(np.float32)
        got = {
            k: float(v)
            for k, v in M.compute_all_jnp(jnp.asarray(pred), jnp.asarray(gt)).items()
        }
        # reference protocol: clamp pred, mask gt
        mask = M.compute_valid_depth_mask(gt)
        p = np.clip(pred, 0.3, 8.0)[mask]
        g = gt[mask]
        want = M.compute_errors(p, g)
        for k, v in want.items():
            assert got[k] == pytest.approx(v, rel=2e-4, abs=2e-5), k


class TestScaleAlignment:
    """LSQ scale-aligned eval (`utils/metric.py:407-497`)."""

    def test_abs_scale_exact(self, rng):
        d1 = rng.uniform(0.5, 4.0, 500)
        # pure scale offset: closed-form recovery s = sum(d1*d2)/sum(d1*d1)
        s = M.compute_depth_scale_factor(d1, 1.7 * d1, "abs")
        assert s == pytest.approx(1.7, rel=1e-12)

    def test_log_scale_is_geometric_mean_ratio(self, rng):
        d1 = rng.uniform(0.5, 4.0, 500)
        d2 = rng.uniform(0.5, 4.0, 500)
        want = np.exp(np.mean(np.log(d2) - np.log(d1)))
        assert M.compute_depth_scale_factor(d1, d2, "log") == pytest.approx(want)
        # pure-scale pairs recover the scale exactly in log space
        assert M.compute_depth_scale_factor(d1, 0.25 * d1, "log") == pytest.approx(0.25)

    def test_inv_scale_exact(self, rng):
        d1 = rng.uniform(0.5, 4.0, 500)
        # d2 = s*d1 -> 1/d2 = (1/s)(1/d1); inv-space lsq then reciprocates back
        s = M.compute_depth_scale_factor(d1, 2.0 * d1, "inv")
        assert s == pytest.approx(2.0, rel=1e-12)

    def test_abs_masking_uses_product(self):
        # the reference masks on the PRODUCT terms with the (0.3, 8) window
        # (`utils/metric.py:418`): pairs whose product leaves the window drop
        d1 = np.asarray([1.0, 1.0, 3.0])
        d2 = np.asarray([2.0, 2.0, 3.0])  # third pair: d1*d2 = 9 > 8 -> dropped
        s = M.compute_depth_scale_factor(d1, d2, "abs")
        assert s == pytest.approx(2.0)

    def test_rejects_nonpositive(self):
        with pytest.raises(AssertionError):
            M.compute_depth_scale_factor(np.asarray([1.0, -1.0]), np.asarray([1.0, 1.0]))

    def test_evaluate_depth_scaling_zeroes_scale_error(self, rng):
        gt = rng.uniform(0.5, 2.0, (32, 32))
        pred = gt * 1.5  # scale-ambiguous prediction
        errs, errs_scaled = M.evaluate_depth(
            np.asarray([0.0, 0.0, 1.0]), gt, pred,
            inverse_gt=False, inverse_pred=False,
        )
        assert errs["abs_rel"] > 0.3
        assert errs_scaled["abs_rel"] == pytest.approx(0.0, abs=1e-9)
        assert errs_scaled["rmse"] == pytest.approx(0.0, abs=1e-9)

    def test_evaluate_depth_translation_normalization(self, rng):
        gt = rng.uniform(0.5, 2.0, (16, 16))
        # non-unit translation: gt divided by ||t|| = 2 before comparison
        errs, _ = M.evaluate_depth(
            np.asarray([0.0, 0.0, 2.0]), gt, gt / 2.0,
            inverse_gt=False, inverse_pred=False,
        )
        assert errs["abs_rel"] == pytest.approx(0.0, abs=1e-12)

    def test_evaluate_depth_inverse_buffers(self, rng):
        depth = rng.uniform(0.5, 2.0, (16, 16))
        # default contract evaluates inverse-depth buffers: passing
        # idepth maps with inverse_*=True compares the underlying depths
        errs, _ = M.evaluate_depth(
            np.asarray([0.0, 0.0, 1.0]), 1.0 / depth, 1.0 / depth,
        )
        assert errs["l1"] == pytest.approx(0.0, abs=1e-12)
