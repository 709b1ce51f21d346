"""Pallas kernel correctness vs the jnp reference impls (interpret mode).

Bit-tolerance policy: the two-pass warp evaluates the vertical coordinate at
the column's inverse-mapped position (see kernels/cost_volume_pallas.py), so
on white-noise images (worst case: unit texture gradient per pixel) the
deviation bound is ~|dy/dj| per pixel. Real-TPU runs of the same check
measured max 0.003 / mean 2.4e-4 at 192x256.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cnmnet_tpu.geometry import Camera
from cnmnet_tpu.ops.cost_volume import cost_volume_from_cameras
from cnmnet_tpu.kernels.cost_volume_pallas import cost_volume_pallas

from tests.test_geometry import make_E, rot_z


H, W = 32, 128


def cams(E2):
    K = jnp.asarray(
        [[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], jnp.float32
    )[None]
    c1 = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
    c2 = Camera(extrinsic=jnp.asarray(E2)[None], intrinsic=K)
    return c1, c2


class TestCostVolumePallas:
    @pytest.mark.parametrize(
        "E2,tol",
        [
            (make_E(t=(0.08, 0.02, 0.0)), 2e-3),  # translation: near-exact
            (make_E(rot_z(0.02), (0.08, 0.02, 0.01)), 0.08),  # rotation: two-pass tol
        ],
    )
    def test_matches_jnp_reference(self, rng, E2, tol):
        ref = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
        c1, c2 = cams(E2)
        want = np.asarray(cost_volume_from_cameras(ref, src, c1, c2, 3.0, 8))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(cost_volume_pallas(ref, src, c1, c2, 3.0, 8))
        assert got.shape == want.shape
        err = np.abs(got - want)
        assert err.max() < tol, (err.max(), err.mean())
        assert err.mean() < tol / 5

    def test_batched(self, rng):
        ref = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((2, H, W, 3)), jnp.float32)
        c1a, c2a = cams(make_E(t=(0.05, 0.0, 0.0)))
        c1 = Camera(
            extrinsic=jnp.concatenate([c1a.extrinsic] * 2),
            intrinsic=jnp.concatenate([c1a.intrinsic] * 2),
        )
        c2 = Camera(
            extrinsic=jnp.concatenate([c2a.extrinsic] * 2),
            intrinsic=jnp.concatenate([c2a.intrinsic] * 2),
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(cost_volume_pallas(ref, src, c1, c2, 3.0, 8))
        want = np.asarray(cost_volume_from_cameras(ref, src, c1, c2, 3.0, 8))
        np.testing.assert_allclose(got, want, atol=5e-3)


class TestDenseBilinear:
    def test_matches_gather_formulation(self, rng):
        from cnmnet_tpu.geometry.warp import bilinear_sample, bilinear_sample_dense

        img = jnp.asarray(rng.standard_normal((16, 24, 2)), jnp.float32)
        x = jnp.asarray(rng.uniform(-3, 27, (50,)), jnp.float32)
        y = jnp.asarray(rng.uniform(-3, 19, (50,)), jnp.float32)
        a = np.asarray(bilinear_sample(img, x, y))
        b = np.asarray(bilinear_sample_dense(img, x, y))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_dense_gradients(self):
        import jax
        from cnmnet_tpu.geometry.warp import bilinear_sample_dense

        img = jnp.arange(16.0).reshape(4, 4, 1)

        def f(xy):
            return jnp.sum(bilinear_sample_dense(img, xy[0], xy[1]))

        g = jax.grad(f)(jnp.asarray([[1.3], [2.2]]))
        # analytic: d/dx = img[y0,x0+1]-img[y0,x0] blended over fy
        assert np.all(np.isfinite(np.asarray(g)))
        assert abs(float(g[0, 0]) - 1.0) < 1e-4  # x-gradient of linear ramp
