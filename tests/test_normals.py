"""Depth->normal tests: analytic plane/sphere fixtures + unfold-style oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.geometry import invert_intrinsics
from cnmnet_tpu.ops import depth_to_normal, box_filter
from cnmnet_tpu.ops.normals import normal_mean_angle_deg, solve_normal_equations

from tests.test_geometry import make_K


def np_depth_to_normal_oracle(depth, K_inv, k_size=9):
    """Literal unfold-style reference: per-pixel masked LSQ with identity
    fallback on singular systems — mirrors `depth_util.py:149-203` semantics."""
    H, W = depth.shape
    uv = np.stack(
        [np.tile(np.arange(W), (H, 1)), np.tile(np.arange(H)[:, None], (1, W)), np.ones((H, W))],
        axis=0,
    ).astype(np.float64)
    rays = (K_inv @ uv.reshape(3, -1)).reshape(3, H, W)
    pts = rays * depth[None]
    valid = (depth > 0) & (depth < 10.0)
    r = k_size // 2
    out = np.zeros((H, W, 3))
    for i in range(H):
        for j in range(W):
            A = []
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < H and 0 <= jj < W and valid[ii, jj]:
                        A.append(pts[:, ii, jj])
                    else:
                        A.append(np.zeros(3))
            A = np.stack(A)  # [k^2, 3]
            M = A.T @ A
            rhs = A.sum(0)
            det = np.linalg.det(M)
            if np.isnan(det) or det < 1e-5:
                x = rhs
            else:
                x = np.linalg.solve(M, rhs)
            out[i, j] = x / (np.linalg.norm(x) + 1e-5)
    return out


class TestBoxFilter:
    def test_matches_dense_sum(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 7, 9, 2)), jnp.float32)
        y = np.asarray(box_filter(x, 3))
        xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
        want = sum(
            xp[:, i : i + 7, j : j + 9, :] for i in range(3) for j in range(3)
        )
        np.testing.assert_allclose(y, want, atol=1e-5)

    def test_custom_vjp_matches_autodiff(self, rng):
        """The self-adjoint custom VJP must equal the autodiff gradient of
        the raw conv implementation exactly (same math, cheaper lowering)."""
        import jax

        from cnmnet_tpu.ops.normals import _box_filter_impl

        x = jnp.asarray(rng.standard_normal((2, 8, 16, 3)), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((2, 8, 16, 3)), jnp.float32)

        def loss_custom(x):
            return jnp.sum(box_filter(x, 5) * cot)

        def loss_raw(x):
            return jnp.sum(_box_filter_impl(x, 5) * cot)

        g_custom = np.asarray(jax.grad(loss_custom)(x))
        g_raw = np.asarray(jax.grad(loss_raw)(x))
        np.testing.assert_allclose(g_custom, g_raw, atol=1e-5)


class TestSolve:
    def test_matches_linalg_solve(self, rng):
        A = rng.standard_normal((50, 3)).astype(np.float64)
        M = A.T @ A
        rhs = A.sum(0)
        mom = jnp.asarray(
            [M[0, 0], M[0, 1], M[0, 2], M[1, 1], M[1, 2], M[2, 2], *rhs], jnp.float32
        )
        x = np.asarray(solve_normal_equations(mom[None]))[0]
        want = np.linalg.solve(M, rhs)
        np.testing.assert_allclose(x, want, rtol=2e-3)

    def test_singular_fallback(self):
        mom = jnp.zeros((1, 9)).at[0, 6:].set(jnp.asarray([1.0, 2.0, 3.0]))
        x = np.asarray(solve_normal_equations(mom))[0]
        np.testing.assert_allclose(x, [1.0, 2.0, 3.0])


class TestDepthToNormal:
    def test_flat_fronto_plane(self):
        """Constant depth -> normal is the -z-ish direction (n . p = 1 with
        p = (x, y, d) gives n = (0, 0, 1/d) -> unit (0, 0, 1))."""
        H = W = 32
        K = make_K(fx=40.0, fy=40.0, cx=W / 2, cy=H / 2)
        depth = jnp.full((1, H, W), 2.0)
        n, pts = depth_to_normal(depth, invert_intrinsics(K)[None], k_size=9)
        inner = np.asarray(n)[0, 8:-8, 8:-8]
        np.testing.assert_allclose(inner[..., 2], 1.0, atol=1e-3)
        np.testing.assert_allclose(inner[..., :2], 0.0, atol=1e-2)
        assert pts.shape == (1, H, W, 3)

    def test_slanted_plane_analytic(self):
        """Plane x + z = 4 (normal (1, 0, 1)/sqrt(2)): depth from ray geometry,
        recovered normals must match the analytic normal away from borders."""
        H = W = 32
        fx = fy = 40.0
        K = make_K(fx=fx, fy=fy, cx=W / 2, cy=H / 2)
        K_inv = np.asarray(invert_intrinsics(K))
        uv = np.stack(
            [np.tile(np.arange(W), (H, 1)), np.tile(np.arange(H)[:, None], (1, W)), np.ones((H, W))]
        ).astype(np.float64)
        rays = (K_inv @ uv.reshape(3, -1)).reshape(3, H, W)
        # p = ray * t on the plane: ray_x t + ray_z t = 4 -> t = 4/(rx + rz)
        t = 4.0 / (rays[0] + rays[2])
        depth = (rays[2] * t)[None]  # z-depth
        n, _ = depth_to_normal(
            jnp.asarray(depth, jnp.float32), jnp.asarray(K_inv, jnp.float32)[None]
        )
        inner = np.asarray(n)[0, 8:-8, 8:-8]
        expect = np.asarray([1.0, 0.0, 1.0]) / np.sqrt(2.0)
        err = np.degrees(
            np.arccos(np.clip(inner @ expect, -1, 1))
        )
        assert err.mean() < 1.0, err.mean()

    def test_invalid_depth_masked(self):
        """Pixels with depth 0 get excluded from neighbors' fits."""
        H = W = 24
        K = make_K(fx=30.0, fy=30.0, cx=W / 2, cy=H / 2)
        depth = np.full((H, W), 2.0, np.float32)
        depth[:, : W // 2] = 0.0  # left half invalid
        n, _ = depth_to_normal(jnp.asarray(depth)[None], invert_intrinsics(K)[None])
        right = np.asarray(n)[0, 8:-8, W // 2 + 6 : -4]
        np.testing.assert_allclose(right[..., 2], 1.0, atol=1e-3)
        assert np.all(np.isfinite(np.asarray(n)))

    def test_matches_unfold_oracle(self, rng):
        H = W = 10
        K = make_K(fx=12.0, fy=12.0, cx=W / 2, cy=H / 2)
        K_inv = np.asarray(invert_intrinsics(K), np.float64)
        depth = (2.0 + 0.3 * rng.standard_normal((H, W))).astype(np.float32)
        depth[depth < 0.1] = 0.0
        n, _ = depth_to_normal(jnp.asarray(depth)[None], jnp.asarray(K_inv, jnp.float32)[None], k_size=5)
        want = np_depth_to_normal_oracle(depth.astype(np.float64), K_inv, k_size=5)
        got = np.asarray(n)[0]
        # compare as angle; fp32 stencil vs fp64 oracle
        cos = np.clip(np.sum(got * want, -1), -1, 1)
        ang = np.degrees(np.arccos(np.abs(cos)))
        assert np.percentile(ang, 95) < 1.0, np.percentile(ang, 95)

    def test_mean_angle_metric(self):
        a = jnp.asarray(np.tile([0.0, 0.0, 1.0], (1, 4, 4, 1)), jnp.float32)
        b = jnp.asarray(np.tile([0.0, 1.0, 0.0], (1, 4, 4, 1)), jnp.float32)
        ang = normal_mean_angle_deg(a, b, jnp.ones((1, 4, 4), bool))
        assert float(ang) == pytest.approx(90.0, abs=1e-3)
