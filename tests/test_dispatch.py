"""Kernel backend dispatch tests.

Policy under test (kernels/dispatch.py): auto mode silently falls back to
jnp when a kernel can't serve (with a TPU-only warning); an explicitly
requested backend NEVER falls back — unsupported shapes or a broken kernel
module raise.
"""

import sys

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cnmnet_tpu.kernels import dispatch


@pytest.fixture(autouse=True)
def _reset_backend():
    yield
    dispatch.set_backend(None)


def _normal_inputs(rng, H=16, W=128):
    from cnmnet_tpu.geometry.camera import invert_intrinsics

    # smooth ramp: well-conditioned plane fits, so the two backends agree
    # tightly (noisy fixtures live in tests/test_pallas_kernels.py)
    rows = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    depth = 2.0 + 0.02 * jnp.broadcast_to(rows, (1, H, W))
    K = jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])[None]
    return depth, invert_intrinsics(K)


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
    def test_depth_to_normal_artifact_agrees_with_jnp(self, rng):
        """The demoted normals kernel (now a reference artifact, imported
        directly — dispatch never routes to it) must still agree with the
        shipped jnp implementation. Angular tolerance: both are f32 and the
        uncentered Gram solve amplifies rounding (see
        tests/test_pallas_kernels.py::TestNormalsPallas for the f64-oracle
        comparison)."""
        from cnmnet_tpu.kernels.normals_pallas import depth_to_normal_pallas

        depth, K_inv = _normal_inputs(rng)
        a, _ = dispatch.depth_to_normal(depth, K_inv, 9, backend="jnp")
        with pltpu.force_tpu_interpret_mode():
            b, _ = depth_to_normal_pallas(depth, K_inv, 9)
        a, b = np.asarray(a), np.asarray(b)
        cos = (a * b).sum(-1) / np.maximum(
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-12
        )
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang.max() < 2.0 and ang.mean() < 0.05, (ang.max(), ang.mean())

    def test_depth_to_normal_pallas_request_raises(self, rng):
        """backend='pallas' for normals is an error, not a silent slow
        path — the kernel is demoted (round-3 VERDICT item 6)."""
        depth, K_inv = _normal_inputs(rng)
        with pytest.raises(ValueError, match="demoted reference artifact"):
            dispatch.depth_to_normal(depth, K_inv, 9, backend="pallas")

    def test_cost_volume_jnp_backend(self, rng):
        from cnmnet_tpu.geometry.camera import Camera

        ref = jnp.asarray(rng.standard_normal((1, 8, 16, 3)), jnp.float32)
        K = jnp.asarray([[10.0, 0, 8], [0, 10.0, 4], [0, 0, 1]])[None]
        cam = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
        vol = dispatch.cost_volume(ref, ref, cam, cam, 3.0, 4, backend="jnp")
        assert vol.shape == (1, 8, 16, 4)
        np.testing.assert_allclose(np.asarray(vol), 0.0, atol=1e-3)


class TestLoudFailures:
    def test_explicit_pallas_cost_volume_odd_planes_pads(self, rng):
        """Unaligned plane counts ride the kernel's exact zero-pad path
        (round-2; the round-1 kernel asserted P % 8 == 0)."""
        from jax.experimental.pallas import tpu as pltpu

        from cnmnet_tpu.geometry.camera import Camera

        ref = jnp.asarray(rng.standard_normal((1, 16, 128, 3)), jnp.float32)
        K = jnp.asarray([[10.0, 0, 64], [0, 10.0, 8], [0, 0, 1]])[None]
        cam = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
        with pltpu.force_tpu_interpret_mode():
            vol = dispatch.cost_volume(ref, ref, cam, cam, 3.0, 6, backend="pallas")
        assert vol.shape == (1, 16, 128, 6)
        np.testing.assert_allclose(np.asarray(vol), 0.0, atol=1e-3)

    def test_explicit_pallas_cost_volume_vmem_blowup_raises(self, rng):
        """Shapes whose padded VMEM working set cannot fit still raise."""
        from cnmnet_tpu.geometry.camera import Camera

        ref = jnp.zeros((1, 1024, 1408, 3), jnp.float32)
        K = jnp.asarray([[10.0, 0, 704], [0, 10.0, 512], [0, 0, 1]])[None]
        cam = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
        with pytest.raises(ValueError, match="does not support these shapes"):
            dispatch.cost_volume(ref, ref, cam, cam, 3.0, 64, backend="pallas")

    def test_global_force_counts_as_explicit(self, rng):
        """set_backend('pallas') + shapes the cost-volume kernel cannot
        serve (VMEM blowup) must raise, exactly like a per-call request."""
        from cnmnet_tpu.geometry.camera import Camera

        dispatch.set_backend("pallas")
        ref = jnp.zeros((1, 1024, 1408, 3), jnp.float32)
        K = jnp.asarray([[10.0, 0, 704], [0, 10.0, 512], [0, 0, 1]])[None]
        cam = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
        with pytest.raises(ValueError, match="does not support these shapes"):
            dispatch.cost_volume(ref, ref, cam, cam, 3.0, 64)

    def test_explicit_pallas_broken_module_raises(self, rng, monkeypatch):
        """A kernel module that fails to import must raise when requested —
        the round-1 silent-fallback regression."""
        from cnmnet_tpu.geometry.camera import Camera

        class Broken:
            pass  # lacks cost_volume_pallas

        monkeypatch.setitem(
            sys.modules, "cnmnet_tpu.kernels.cost_volume_pallas", Broken()
        )
        ref = jnp.zeros((1, 16, 128, 3), jnp.float32)
        K = jnp.asarray([[10.0, 0, 64], [0, 10.0, 8], [0, 0, 1]])[None]
        cam = Camera(extrinsic=jnp.eye(4)[None], intrinsic=K)
        with pytest.raises(ImportError, match="failed to load"):
            dispatch.cost_volume(ref, ref, cam, cam, 3.0, 8, backend="pallas")

    def test_auto_mode_normals_always_jnp(self, rng):
        """No force, no explicit backend: normals use jnp everywhere (the
        kernel is demoted), including shapes the artifact couldn't serve."""
        depth, K_inv = _normal_inputs(rng, H=16, W=100)
        n, _ = dispatch.depth_to_normal(depth, K_inv, 5)
        assert n.shape == (1, 16, 100, 3)
