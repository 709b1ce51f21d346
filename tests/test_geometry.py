"""Geometry unit tests with analytic fixtures (SURVEY.md §4 strategy (a))."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.geometry import (
    Camera,
    camera_from_array,
    camera_to_array,
    invert_intrinsics,
    invert_se3,
    relative_pose,
    scale_intrinsics,
    pixel_grid,
    plane_sweep_terms,
    bilinear_sample,
    pixel2cam,
    inverse_warp,
)


def make_K(fx=100.0, fy=110.0, cx=32.0, cy=24.0):
    return jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)


def make_E(R=None, t=(0.0, 0.0, 0.0)):
    E = np.eye(4, dtype=np.float32)
    if R is not None:
        E[:3, :3] = R
    E[:3, 3] = t
    return jnp.asarray(E)


def rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestCameraAlgebra:
    def test_invert_intrinsics_closed_form(self):
        K = make_K()
        np.testing.assert_allclose(invert_intrinsics(K), np.linalg.inv(K), atol=1e-5)

    def test_invert_intrinsics_with_skew(self):
        K = make_K().at[0, 1].set(2.5)
        np.testing.assert_allclose(invert_intrinsics(K), np.linalg.inv(K), atol=1e-5)

    def test_invert_se3(self):
        E = make_E(rot_z(0.3), (1.0, -2.0, 0.5))
        np.testing.assert_allclose(invert_se3(E), np.linalg.inv(E), atol=1e-6)

    def test_relative_pose_identity(self):
        cam = Camera(extrinsic=make_E(rot_z(0.2), (1, 2, 3)), intrinsic=make_K())
        rel = relative_pose(cam, cam)
        np.testing.assert_allclose(rel, np.eye(4), atol=1e-6)

    def test_relative_pose_translation(self):
        # src camera displaced by +x in world; world->cam of src subtracts it.
        ref = Camera(extrinsic=make_E(), intrinsic=make_K())
        src = Camera(extrinsic=make_E(t=(-1.0, 0, 0)), intrinsic=make_K())
        rel = relative_pose(ref, src)
        np.testing.assert_allclose(rel[:3, 3], [-1.0, 0, 0], atol=1e-6)

    def test_camera_array_roundtrip(self):
        cam = np.zeros((2, 4, 4), np.float32)
        cam[0] = np.asarray(make_E(rot_z(0.1), (0.3, 0, 0)))
        cam[1][:3, :3] = np.asarray(make_K())
        c = camera_from_array(jnp.asarray(cam))
        back = camera_to_array(c)
        np.testing.assert_allclose(back, cam, atol=0)

    def test_scale_intrinsics(self):
        K = make_K()
        K2 = scale_intrinsics(K, 0.5, 0.25)
        assert K2[0, 0] == K[0, 0] * 0.5
        assert K2[1, 1] == K[1, 1] * 0.25
        assert K2[0, 2] == K[0, 2] * 0.5
        assert K2[1, 2] == K[1, 2] * 0.25
        assert K2[2, 2] == 1.0

    def test_pixel_grid(self):
        g = pixel_grid(4, 6)
        assert g.shape == (3, 4, 6)
        assert g[0, 2, 5] == 5  # u = column
        assert g[1, 2, 5] == 2  # v = row
        assert g[2].min() == g[2].max() == 1.0


class TestBilinearSample:
    def test_integer_coords_identity(self, rng):
        img = jnp.asarray(rng.standard_normal((8, 10, 3)), jnp.float32)
        g = pixel_grid(8, 10)
        out = bilinear_sample(img, g[0], g[1])
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_half_pixel_average(self):
        img = jnp.asarray([[0.0, 2.0], [4.0, 6.0]], jnp.float32)[..., None]
        out = bilinear_sample(img, jnp.asarray([[0.5]]), jnp.asarray([[0.5]]))
        assert out[0, 0, 0] == pytest.approx(3.0)

    def test_zero_padding_outside(self):
        img = jnp.ones((4, 4, 1), jnp.float32)
        out = bilinear_sample(
            img, jnp.asarray([-2.0, 5.0, 1.0]), jnp.asarray([0.0, 0.0, -0.5])
        )
        assert out[0, 0] == 0.0
        assert out[1, 0] == 0.0
        assert out[2, 0] == pytest.approx(0.5)  # half-in at the top border

    def test_gradient_flows(self):
        import jax

        img = jnp.ones((4, 4, 1), jnp.float32)

        def f(xy):
            return jnp.sum(bilinear_sample(img * 2.0, xy[0], xy[1]))

        g = jax.grad(f)(jnp.asarray([[1.2], [1.7]]))
        assert np.all(np.isfinite(g))


class TestWarping:
    def test_pixel2cam_analytic(self):
        K = make_K(fx=2.0, fy=2.0, cx=1.0, cy=1.0)
        depth = jnp.full((1, 3, 3), 4.0)
        pts = pixel2cam(depth, invert_intrinsics(K)[None])
        # center pixel (1,1) is on the optical axis
        np.testing.assert_allclose(pts[0, 1, 1], [0, 0, 4.0], atol=1e-5)
        # pixel (1, 2): u=2 -> x = (2-1)/2 * 4 = 2
        np.testing.assert_allclose(pts[0, 1, 2], [2.0, 0, 4.0], atol=1e-5)

    def test_inverse_warp_identity_pose(self, rng):
        feat = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
        depth = jnp.full((1, 8, 8), 2.0)
        K = make_K(fx=8.0, fy=8.0, cx=4.0, cy=4.0)
        pose = jnp.eye(4)[None, :3, :]
        warped, z = inverse_warp(feat, depth, pose, K[None], invert_intrinsics(K)[None])
        np.testing.assert_allclose(warped, feat, atol=1e-4)
        np.testing.assert_allclose(z, depth, atol=1e-5)

    def test_inverse_warp_known_shift(self, rng):
        # Fronto-parallel plane at depth d, pure x-translation t between views:
        # disparity = fx * tx / d pixels, constant over the image.
        H = W = 16
        fx = fy = 20.0
        d = 2.0
        tx = 0.5
        shift = fx * tx / d  # = 5 px
        K = make_K(fx=fx, fy=fy, cx=W / 2, cy=H / 2)
        img = jnp.asarray(rng.standard_normal((H, W, 1)), jnp.float32)
        # pose ref->src translates camera: point in src frame = p_ref + t
        pose = jnp.concatenate([jnp.eye(3), jnp.asarray([[tx], [0], [0]])], axis=1)[None]
        depth = jnp.full((1, H, W), d)
        warped, _ = inverse_warp(img[None], depth, pose, K[None], invert_intrinsics(K)[None])
        # warped[y, x] = img[y, x + shift]
        inner = np.asarray(warped[0, :, : W - int(shift) - 1, 0])
        expect = np.asarray(img[:, int(shift) : W - 1, 0])
        np.testing.assert_allclose(inner, expect, atol=1e-4)

    def test_plane_sweep_terms_identity(self):
        K = make_K()
        cam = Camera(extrinsic=make_E(), intrinsic=K)
        KRKiUV, KT = plane_sweep_terms(cam, cam, 4, 6)
        # identity relative pose: KRK^-1 = I, KT = 0
        uv = pixel_grid(4, 6).reshape(3, -1)
        np.testing.assert_allclose(KRKiUV, uv, atol=1e-4)
        np.testing.assert_allclose(KT, 0.0, atol=1e-6)
