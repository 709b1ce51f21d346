import numpy as np
import pytest

from cnmnet_tpu.data.plane_tools import (
    fit_plane,
    fit_transformation_ransac,
    merge_coplanar_planes,
    plane_params_to_normal_offset,
    transform_planes,
    write_ply,
)


class TestFitPlane:
    def test_recovers_plane(self, rng):
        n = np.asarray([0.0, 0.0, 0.5])  # plane z = 2 -> param = n/d with n.p=1
        pts = rng.uniform(-1, 1, (50, 3))
        pts[:, 2] = 2.0
        param = fit_plane(pts)
        np.testing.assert_allclose(param, n, atol=1e-6)

    def test_normal_offset(self):
        nrm, off = plane_params_to_normal_offset(np.asarray([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(nrm, [0, 0, 1])
        assert off == 2.0


class TestTransformPlanes:
    def test_pure_translation(self):
        # plane z = 2 (param = 2 * (0,0,1)); camera moved -1 in z:
        # p' = p + (0,0,1) -> plane z' = 3
        E = np.eye(4)
        E[2, 3] = 1.0
        out = transform_planes(E, np.asarray([[0.0, 0.0, 2.0]]))
        np.testing.assert_allclose(out[0], [0, 0, 3.0], atol=1e-6)

    def test_rotation_consistency(self, rng):
        # points on the plane must satisfy the transformed equation
        E = np.eye(4)
        th = 0.4
        E[:3, :3] = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        E[:3, 3] = [0.2, -0.1, 0.3]
        param = np.asarray([0.3, -0.2, 1.4])
        n, d = plane_params_to_normal_offset(param)
        pts = rng.uniform(-2, 2, (20, 3))
        # project points onto the plane n.p = d
        pts = pts + (d - pts @ n)[:, None] * n
        out = transform_planes(E, param[None])[0]
        n2, d2 = plane_params_to_normal_offset(out)
        pts2 = pts @ E[:3, :3].T + E[:3, 3]
        np.testing.assert_allclose(pts2 @ n2, d2, atol=1e-5)


class TestMerge:
    def test_merges_coplanar(self):
        planes = np.asarray([[0, 0, 2.0], [0, 0.001, 2.0], [1.0, 0, 0]])
        seg = np.full((8, 8), 20, np.int32)
        seg[:2] = 0
        seg[2:4] = 1
        seg[4:6] = 2
        merged, new_seg = merge_coplanar_planes(planes, seg)
        assert len(merged) == 2
        assert set(np.unique(new_seg)) == {0, 1, 20}
        # labels 0 and 1 merged into one
        assert np.all(new_seg[:4] == new_seg[0, 0])

    def test_respects_offset_threshold(self):
        planes = np.asarray([[0, 0, 2.0], [0, 0, 3.0]])  # parallel, far apart
        seg = np.full((4, 4), 20, np.int32)
        seg[:2] = 0
        seg[2:] = 1
        merged, _ = merge_coplanar_planes(planes, seg)
        assert len(merged) == 2


class TestRansac:
    def test_recovers_rigid_transform(self, rng):
        th = 0.3
        R = np.asarray(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        t = np.asarray([0.5, -0.2, 1.0])
        src = rng.uniform(-1, 1, (40, 3))
        dst = src @ R.T + t
        dst[::10] += 5.0  # 10% outliers
        T, inliers = fit_transformation_ransac(src, dst, seed=3)
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)
        assert inliers.sum() == 36


class TestPly:
    def test_write(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (5, 3))
        colors = (rng.random((5, 3)) * 255).astype(np.uint8)
        path = tmp_path / "cloud.ply"
        write_ply(str(path), pts, colors)
        text = path.read_text()
        assert "element vertex 5" in text
        assert len(text.strip().splitlines()) == 10 + 5  # header + points
