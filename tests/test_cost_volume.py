"""Cost-volume tests: analytic fixtures + a numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.geometry import Camera, plane_sweep_terms, invert_intrinsics
from cnmnet_tpu.ops import (
    idepth_hypotheses,
    plane_sweep_cost_volume,
    cost_volume_from_cameras,
)

from tests.test_geometry import make_K, make_E


def np_cost_volume_oracle(ref, src, KRKiUV, KT, idepths):
    """Straightforward per-plane numpy loop; zero padding, pixel-space sample."""
    H, W, C = ref.shape
    P = len(idepths)
    out = np.zeros((H, W, P), np.float32)
    for pi, idepth in enumerate(np.asarray(idepths)):
        depth = 1.0 / idepth
        hom = KRKiUV * depth + KT  # [3, HW]
        z = hom[2] * idepth + 1e-6  # same scaling as the op (projective)
        x = (hom[0] * idepth) / z
        y = (hom[1] * idepth) / z
        x = x.reshape(H, W)
        y = y.reshape(H, W)
        warped = np.zeros((H, W, C), np.float32)
        for i in range(H):
            for j in range(W):
                xx, yy = x[i, j], y[i, j]
                x0, y0 = int(np.floor(xx)), int(np.floor(yy))
                fx, fy = xx - x0, yy - y0
                acc = np.zeros(C, np.float32)
                for (xi, yi, w) in (
                    (x0, y0, (1 - fx) * (1 - fy)),
                    (x0 + 1, y0, fx * (1 - fy)),
                    (x0, y0 + 1, (1 - fx) * fy),
                    (x0 + 1, y0 + 1, fx * fy),
                ):
                    if 0 <= xi < W and 0 <= yi < H:
                        acc += w * src[yi, xi]
                warped[i, j] = acc
        out[:, :, pi] = np.abs(warped - ref).sum(-1)
    return out


class TestIdepthHypotheses:
    def test_scale3(self):
        d = idepth_hypotheses(3.0)
        assert d.shape == (64,)
        assert d[0] == pytest.approx(0.1)
        assert d[-1] == pytest.approx(3.0)
        steps = np.diff(np.asarray(d))
        np.testing.assert_allclose(steps, (3.0 - 0.1) / 63.0, rtol=1e-5)

    def test_scale2(self):
        d = idepth_hypotheses(2.0)
        assert d[0] == pytest.approx(0.02)
        assert d[-1] == pytest.approx(2.0)


class TestCostVolume:
    def test_identity_cameras_zero_cost_at_any_plane(self, rng):
        """Same camera for ref and src: warp is identity for every plane."""
        H, W = 8, 12
        img = jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)
        cam = Camera(extrinsic=make_E(), intrinsic=make_K(cx=W / 2, cy=H / 2))
        KRKiUV, KT = plane_sweep_terms(cam, cam, H, W)
        vol = plane_sweep_cost_volume(img, img, KRKiUV, KT, idepth_hypotheses(3.0, 8))
        assert vol.shape == (H, W, 8)
        np.testing.assert_allclose(vol, 0.0, atol=1e-4)

    def test_correct_plane_has_min_cost(self, rng):
        """Fronto-parallel textured plane at depth d: cost at the d-plane ~ 0,
        wrong planes > 0 (the plane-sweep principle)."""
        H, W = 16, 24
        fx = fy = 30.0
        depth = 2.0  # inside [1/3, 10] for scale 3.0
        K = make_K(fx=fx, fy=fy, cx=W / 2, cy=H / 2)
        # smooth texture so bilinear resampling error is small
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        tex = np.sin(xx * 0.7) + np.cos(yy * 0.9) + 0.1 * xx
        ref = jnp.asarray(tex[..., None], jnp.float32)
        tx = 0.1
        shift = fx * tx / depth  # 1.5 px
        # src extrinsic t=(tx,0,0): a world point (x,y,z) lands in the source
        # camera at (x+tx, y, z), i.e. u_src = u_ref + fx*tx/z. The correct
        # plane's warp samples src at u + shift, which must equal ref(u):
        # src(v) = tex(v - shift).
        src_tex = np.sin((xx - shift) * 0.7) + np.cos(yy * 0.9) + 0.1 * (xx - shift)
        src = jnp.asarray(src_tex[..., None], jnp.float32)

        ref_cam = Camera(extrinsic=make_E(), intrinsic=K)
        src_cam = Camera(extrinsic=make_E(t=(tx, 0, 0)), intrinsic=K)
        KRKiUV, KT = plane_sweep_terms(ref_cam, src_cam, H, W)
        idepths = idepth_hypotheses(3.0, 64)
        vol = np.asarray(
            plane_sweep_cost_volume(ref, src, KRKiUV, KT, idepths)
        )
        # interior pixels only (borders hit zero padding)
        inner = vol[4:-4, 6:-6, :].mean(axis=(0, 1))
        best = int(np.argmin(inner))
        true_plane = int(np.argmin(np.abs(np.asarray(idepths) - 1.0 / depth)))
        assert abs(best - true_plane) <= 1, (best, true_plane)

    def test_matches_numpy_oracle(self, rng):
        H, W = 6, 8
        ref = rng.standard_normal((H, W, 3)).astype(np.float32)
        src = rng.standard_normal((H, W, 3)).astype(np.float32)
        K = make_K(fx=10.0, fy=10.0, cx=W / 2, cy=H / 2)
        ref_cam = Camera(extrinsic=make_E(), intrinsic=K)
        from tests.test_geometry import rot_z

        src_cam = Camera(
            extrinsic=make_E(rot_z(0.05), (0.1, -0.05, 0.02)), intrinsic=K
        )
        KRKiUV, KT = plane_sweep_terms(ref_cam, src_cam, H, W)
        idepths = idepth_hypotheses(3.0, 8)
        got = np.asarray(
            plane_sweep_cost_volume(
                jnp.asarray(ref), jnp.asarray(src), KRKiUV, KT, idepths
            )
        )
        want = np_cost_volume_oracle(
            ref, src, np.asarray(KRKiUV), np.asarray(KT), np.asarray(idepths)
        )
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_batched_from_cameras(self, rng):
        B, H, W = 2, 8, 8
        ref = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        K = make_K(cx=W / 2, cy=H / 2)
        cams = Camera(
            extrinsic=jnp.stack([make_E(), make_E(t=(0.1, 0, 0))]),
            intrinsic=jnp.stack([K, K]),
        )
        ref_cams = Camera(
            extrinsic=jnp.stack([make_E(), make_E()]), intrinsic=jnp.stack([K, K])
        )
        vol = cost_volume_from_cameras(ref, src, ref_cams, cams, 3.0, 16)
        assert vol.shape == (B, H, W, 16)
        assert np.all(np.isfinite(np.asarray(vol)))
