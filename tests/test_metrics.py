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
