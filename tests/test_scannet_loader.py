"""ScanNet dataset loader tests on a mock on-disk scene tree.

Covers both decode paths (native C++ and cv2 fallback), the plane-field
assembly the reference's shipped loader dropped, and the
dataloader_pixel_normal normal_color variant.
"""

import os

import numpy as np
import pytest

from cnmnet_tpu.data.cameras import write_cam_text
from cnmnet_tpu.data.scannet import ScanNetDataset


H0, W0 = 96, 128  # on-disk resolution
H, W = 48, 64  # loader output


@pytest.fixture(scope="module")
def mock_scannet(tmp_path_factory):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    root = tmp_path_factory.mktemp("scannet")
    scene = root / "scene0000_00"
    for sub in (
        "rgb", "depth", "lg_normal", "cameras",
        "planercnn_seg_003", "planercnn_para_003", "normal_color",
    ):
        (scene / sub).mkdir(parents=True)

    rng = np.random.default_rng(0)
    K = np.asarray([[100.0, 0, W0 / 2], [0, 100.0, H0 / 2], [0, 0, 1]])
    for fid in (0, 10, 20, 30):
        rgb = (rng.random((H0, W0, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / "rgb" / f"{fid}.jpg"), rgb[..., ::-1])
        depth_mm = np.full((H0, W0), 2500, np.uint16)
        depth_mm[:8] = 50  # < 0.1 m -> clamped to 0
        depth_mm[-8:] = 7000  # > depth_scale -> clamped to 0
        cv2.imwrite(str(scene / "depth" / f"{fid}.png"), depth_mm)
        normal = np.zeros((H0, W0, 3), np.float32)
        normal[..., 2] = 1.0
        np.save(str(scene / "lg_normal" / f"{fid}.npy"), normal)
        color = ((normal / 2 + 0.5) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / "normal_color" / f"{fid}.png"), color[..., ::-1])
        E = np.eye(4)
        E[0, 3] = 0.01 * fid
        (scene / "cameras" / f"{fid}_cam.txt").write_text(write_cam_text(E, K))
        seg = np.full((H0, W0), 7, np.uint8)  # max label -> non-planar (20)
        seg[: H0 // 2] = 0
        seg[H0 // 2 :, : W0 // 2] = 1
        cv2.imwrite(str(scene / "planercnn_seg_003" / f"{fid}.png"), seg)
        para = np.zeros((8, 3), np.float32)
        para[0] = [0, 0, 2.5]
        para[1] = [0, 2.0, 0.5]
        np.save(str(scene / "planercnn_para_003" / f"{fid}.npy"), para)

    (root / "list.txt").write_text("scene0000_00 10\nscene0000_00 20\n")
    return str(root)


def make_ds(root, **kw):
    return ScanNetDataset(
        list_filepath=os.path.join(root, "list.txt"),
        root_dir=root,
        image_height=H,
        image_width=W,
        **kw,
    )


class TestScanNetDataset:
    def test_sample_contract(self, mock_scannet):
        ds = make_ds(mock_scannet, use_native=False)
        assert len(ds) == 2
        s = ds[0]
        assert s["images"].shape == (3, H, W, 3)
        assert s["depths"].shape == (3, H, W)
        assert s["cams"].shape == (3, 2, 4, 4)
        assert s["normals"].shape == (H, W, 3)
        assert s["disparity"].shape == (H, W)
        assert s["instance_segs"].shape == (20, H, W)
        assert int(s["planes_num"]) == 2
        # intrinsics rescaled by 0.5
        assert s["cams"][0, 1, 0, 0] == pytest.approx(50.0)
        # depth clamps applied
        d = s["depths"][0]
        assert d[0, W // 2] == 0.0 and d[-1, W // 2] == 0.0
        assert d[H // 2, W // 2] == pytest.approx(2.5)
        # disparity = 1/(depth + 1e-4) inside [0.02, 3]
        assert s["disparity"][H // 2, W // 2] == pytest.approx(1 / 2.5001, rel=1e-3)
        assert s["disparity"][0, W // 2] == 0.0

    def test_source_views_and_cameras(self, mock_scannet):
        ds = make_ds(mock_scannet, use_native=False)
        s = ds[0]  # ref id 10, sources 0 and 20
        assert s["cams"][0, 0, 0, 3] == pytest.approx(0.1)  # ref tx
        tx = sorted([s["cams"][1, 0, 0, 3], s["cams"][2, 0, 0, 3]])
        assert tx == pytest.approx([0.0, 0.2])

    def test_plane_fields(self, mock_scannet):
        ds = make_ds(mock_scannet, use_native=False)
        s = ds[0]
        seg = s["plane_segs"]
        assert set(np.unique(seg)) <= {0, 1, 20}
        inst = s["instance_segs"]
        # instances disjoint and match the label map
        assert np.max(inst.sum(0)) <= 1.0
        np.testing.assert_array_equal(inst[0] > 0, seg == 0)
        # plane-para normal map: unit normals inside instances; PlaneRCNN
        # y<->z coordinate swap applied (para [0,2,0.5] -> [0,-0.5,2] dir)
        npp = s["normals_from_plane_para"]
        norms = np.linalg.norm(npp[seg == 1], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    def test_native_matches_cv2(self, mock_scannet):
        from cnmnet_tpu.data import native

        if not native.available():
            pytest.skip(f"native loader unavailable: {native.build_error()}")
        a = make_ds(mock_scannet, use_native=False)[0]
        b = make_ds(mock_scannet, use_native=True)[0]
        # depth path identical (same nearest resample + clamps)
        np.testing.assert_allclose(b["depths"], a["depths"], atol=1e-6)
        # rgb: different JPEG IDCT + resize rounding; bounded difference
        assert np.abs(b["images"] - a["images"]).mean() < 0.05

    def test_uint8_wire_cv2(self, mock_scannet):
        from cnmnet_tpu.data.pipeline import normalize_images

        f = make_ds(mock_scannet, use_native=False)[0]
        u = make_ds(mock_scannet, use_native=False, wire_dtype="uint8")[0]
        assert u["images"].dtype == np.uint8
        # u8 wire + host affine == float wire, up to half-step quantization
        np.testing.assert_allclose(
            normalize_images(u["images"].astype(np.float32) / 255.0),
            f["images"],
            atol=(0.5 / 255) / 0.224 + 1e-5,
        )
        # non-image fields unaffected by the wire format
        np.testing.assert_array_equal(u["depths"], f["depths"])

    def test_uint8_wire_native_matches_cv2(self, mock_scannet):
        from cnmnet_tpu.data import native

        if not native.available():
            pytest.skip(f"native loader unavailable: {native.build_error()}")
        a = make_ds(mock_scannet, use_native=False, wire_dtype="uint8")[0]
        b = make_ds(mock_scannet, use_native=True, wire_dtype="uint8")[0]
        assert b["images"].dtype == np.uint8
        # different JPEG IDCT + resize rounding; bounded u8 difference
        diff = np.abs(
            b["images"].astype(np.int32) - a["images"].astype(np.int32)
        )
        assert diff.mean() < 0.05 * 255

    def test_normal_color_variant(self, mock_scannet):
        ds = make_ds(mock_scannet, use_native=False, normal_source="normal_color")
        s = ds[0]
        inner = s["normals"][8:-8]
        np.testing.assert_allclose(inner[..., 2], 1.0, atol=0.01)
        np.testing.assert_allclose(inner[..., :2], 0.0, atol=0.01)
