"""Plane-annotation pipeline tests on a mock PlaneRCNN-style scene."""

import os

import numpy as np
import pytest

from cnmnet_tpu.data.prep_planes import (
    NON_PLANAR,
    decode_packed_segmentation,
    prepare_scene,
)


@pytest.fixture(scope="module")
def mock_scene(tmp_path_factory):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 required")
    scene = tmp_path_factory.mktemp("scene0000_00")
    H, W = 96, 128
    fx = 100.0
    K4 = np.eye(4)
    K4[0, 0] = K4[1, 1] = fx
    K4[0, 2], K4[1, 2] = W / 2, H / 2
    (scene / "intrinsic").mkdir()
    np.savetxt(scene / "intrinsic" / "intrinsic_depth.txt", K4)

    ann = scene / "annotation"
    (ann / "segmentation").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "pose").mkdir()

    # two world planes: back wall z=3 (param 3*(0,0,1)), floor-ish z=2 plane
    planes = np.asarray([[0.0, 0.0, 3.0], [0.0, 0.0, 2.0]], np.float32)
    np.save(ann / "planes.npy", planes)

    for fid in ("0", "10"):
        # identity pose: camera frame == world frame
        np.savetxt(scene / "pose" / f"{fid}.txt", np.eye(4))
        # left half plane 0 (z=3), right half plane 1 (z=2)
        gid = np.full((H, W), -1, np.int64)
        gid[:, : W // 2] = 0
        gid[:, W // 2 :] = 1
        packed = (gid + 1).astype(np.int64)
        seg_rgb = np.stack(
            [packed // (256 * 256), (packed // 256) % 256, packed % 256], -1
        ).astype(np.uint8)
        cv2.imwrite(
            str(ann / "segmentation" / f"{fid}.png"),
            cv2.cvtColor(seg_rgb, cv2.COLOR_RGB2BGR),
        )
        depth = np.zeros((H, W), np.float64)
        depth[:, : W // 2] = 3.0
        depth[:, W // 2 :] = 2.0
        # fronto-parallel planes: plane depth is constant = offset
        cv2.imwrite(
            str(scene / "depth" / f"{fid}.png"),
            (depth * 1000).astype(np.uint16),
        )
    return str(scene)


class TestDecode:
    def test_roundtrip(self):
        gid = np.asarray([[-1, 0], [41, 70000]], np.int64)
        packed = gid + 1
        rgb = np.stack(
            [packed // 65536, (packed // 256) % 256, packed % 256], -1
        ).astype(np.uint8)
        np.testing.assert_array_equal(decode_packed_segmentation(rgb), gid)


class TestPrepareScene:
    def test_writes_frame_annotations(self, mock_scene):
        n = prepare_scene(mock_scene, num_workers=2)
        assert n == 2
        import cv2

        seg = cv2.imread(os.path.join(mock_scene, "planercnn_seg_003", "0.png"), -1)
        para = np.load(os.path.join(mock_scene, "planercnn_para_003", "0.npy"))
        labels = set(np.unique(seg)) - {NON_PLANAR}
        assert labels == {0, 1}
        assert para.shape == (2, 3)
        # identity pose: camera-frame params == world params (order may swap)
        offs = sorted(np.linalg.norm(para, axis=1))
        assert offs == pytest.approx([2.0, 3.0], abs=1e-3)
        # depth-consistency: labels cover their half-planes
        H, W = seg.shape
        left_label = seg[H // 2, W // 4]
        right_label = seg[H // 2, 3 * W // 4]
        assert left_label != right_label
        assert (seg[:, : W // 2] == left_label).mean() > 0.95

    def test_rejects_frames_with_bad_depth(self, mock_scene, tmp_path):
        """Depth disagreeing with every plane by >1 m rejects the frame."""
        import cv2
        import shutil

        bad = tmp_path / "bad_scene"
        shutil.copytree(mock_scene, bad)
        H, W = 96, 128
        depth = np.full((H, W), 9.0)
        for fid in ("0", "10"):
            cv2.imwrite(
                str(bad / "depth" / f"{fid}.png"),
                (depth * 1000).astype(np.uint16),
            )
            # remove stale outputs copied from the fixture
        shutil.rmtree(bad / "planercnn_seg_003")
        shutil.rmtree(bad / "planercnn_para_003")
        n = prepare_scene(str(bad), num_workers=1)
        assert n == 0
