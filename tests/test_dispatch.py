"""Kernel backend dispatch tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.kernels import dispatch


@pytest.fixture(autouse=True)
def _reset_backend():
    yield
    dispatch.set_backend(None)


class TestBackendSelection:
    def test_default_on_cpu_is_jnp(self):
        assert dispatch.get_backend() == "jnp"  # tests run on the CPU mesh

    def test_force_and_reset(self):
        dispatch.set_backend("pallas")
        assert dispatch.get_backend() == "pallas"
        dispatch.set_backend(None)
        assert dispatch.get_backend() == "jnp"

    def test_unknown_backend_rejected(self):
        with pytest.raises(ValueError):
            dispatch.set_backend("cuda")


class TestDispatchedOps:
    def test_depth_to_normal_backends_agree(self, rng):
        """'pallas' falls back to jnp for normals (no kernel yet) — results
        must be identical either way."""
        from cnmnet_tpu.geometry.camera import invert_intrinsics

        depth = jnp.asarray(2.0 + 0.1 * rng.standard_normal((1, 16, 16)), jnp.float32)
        K = jnp.asarray([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])[None]
        a, _ = dispatch.depth_to_normal(depth, invert_intrinsics(K), 5, backend="jnp")
        b, _ = dispatch.depth_to_normal(depth, invert_intrinsics(K), 5, backend="pallas")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cost_volume_jnp_backend(self, rng):
        from cnmnet_tpu.geometry.camera import Camera

        ref = jnp.asarray(rng.standard_normal((1, 8, 16, 3)), jnp.float32)
        K = jnp.asarray([[10.0, 0, 8], [0, 10.0, 4], [0, 0, 1]])[None]
        cam = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
        vol = dispatch.cost_volume(ref, ref, cam, cam, 3.0, 4, backend="jnp")
        assert vol.shape == (1, 8, 16, 4)
        np.testing.assert_allclose(np.asarray(vol), 0.0, atol=1e-3)
