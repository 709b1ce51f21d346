"""Data layer tests: synthetic generator geometry, collation, camera IO,
prep tools — no external datasets required."""

import numpy as np
import jax.numpy as jnp
import pytest

from cnmnet_tpu.data.cameras import (
    load_cam_text,
    make_cam_array,
    scale_cam_array,
    write_cam_text,
)
from cnmnet_tpu.data.pipeline import (
    PrefetchLoader,
    collate,
    denormalize_images,
    normalize_images,
)
from cnmnet_tpu.data.synthetic import SyntheticScenes


class TestCameraIO:
    def test_roundtrip(self, rng):
        E = np.eye(4)
        E[:3, 3] = [0.1, -0.2, 0.3]
        K = np.asarray([[222.0, 0, 128], [0, 222.0, 96], [0, 0, 1]])
        text = write_cam_text(E, K, 300.0, 35.0)
        cam = load_cam_text(text)
        np.testing.assert_allclose(cam[0], E, atol=1e-6)
        np.testing.assert_allclose(cam[1, :3, :3], K, atol=1e-4)

    def test_roundtrip_without_depth_pair(self):
        E = np.eye(4)
        K = np.asarray([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        cam = load_cam_text(write_cam_text(E, K))
        np.testing.assert_allclose(cam[1, :3, :3], K, atol=1e-4)

    def test_scale(self):
        cam = make_cam_array(np.eye(4), np.asarray([[100.0, 0, 64], [0, 80.0, 48], [0, 0, 1]]))
        out = scale_cam_array(cam, 0.5, 0.25)
        assert out[1, 0, 0] == 50.0 and out[1, 1, 1] == 20.0
        assert out[1, 0, 2] == 32.0 and out[1, 1, 2] == 12.0


class TestSyntheticScenes:
    def test_sample_contract(self):
        ds = SyntheticScenes(num_samples=2, height=24, width=32, view_num=3)
        s = ds[0]
        assert s["images"].shape == (3, 24, 32, 3)
        assert s["depths"].shape == (3, 24, 32)
        assert s["cams"].shape == (3, 2, 4, 4)
        assert s["normals"].shape == (24, 32, 3)
        assert s["instance_segs"].shape == (20, 24, 32)
        assert 0 < int(s["planes_num"]) <= 20
        assert s["depths"][0].max() > 0.5

    def test_deterministic(self):
        a = SyntheticScenes(4, 16, 16, seed=7)[2]
        b = SyntheticScenes(4, 16, 16, seed=7)[2]
        np.testing.assert_array_equal(a["images"], b["images"])

    def test_depth_normal_consistency(self):
        """The generator's GT must satisfy our depth->normal operator: normals
        recovered from the synthetic depth must match the synthetic normals
        (the check_gt_normal.py golden test, on exact data)."""
        from cnmnet_tpu.geometry.camera import invert_intrinsics
        from cnmnet_tpu.ops import depth_to_normal
        from cnmnet_tpu.ops.normals import normal_mean_angle_deg

        ds = SyntheticScenes(1, 48, 64, view_num=1)
        s = ds[0]
        depth = jnp.asarray(s["depths"][0])[None]
        K = jnp.asarray(s["cams"][0, 1, :3, :3])[None]
        n, _ = depth_to_normal(depth, invert_intrinsics(K), k_size=5)
        valid = jnp.asarray(s["depths"][0] > 0)[None]
        # erode the valid mask: the stencil straddles plane boundaries
        import scipy.ndimage as ndi

        interior = ndi.binary_erosion(
            np.asarray(valid[0]), iterations=4
        ) & ~_label_boundaries(s)
        ang = normal_mean_angle_deg(
            n, jnp.asarray(s["normals"])[None], jnp.asarray(interior)[None]
        )
        assert float(ang) < 5.0, float(ang)

    def test_cross_view_photoconsistency(self):
        """Warping a source view into the ref view with GT depth/pose must
        reproduce the ref image on interior pixels — validates the whole
        geometry convention chain (the plane-sweep signal exists)."""
        from cnmnet_tpu.geometry.camera import invert_intrinsics, invert_se3
        from cnmnet_tpu.geometry.warp import inverse_warp

        ds = SyntheticScenes(1, 48, 64, view_num=3)
        s = ds[0]
        ref_img = s["images"][0]
        src_img = jnp.asarray(s["images"][1])[None]
        depth = jnp.asarray(s["depths"][0])[None]
        E_ref = jnp.asarray(s["cams"][0, 0])
        E_src = jnp.asarray(s["cams"][1, 0])
        K = jnp.asarray(s["cams"][0, 1, :3, :3])
        pose = (E_src @ invert_se3(E_ref))[None, :3, :]
        warped, _ = inverse_warp(
            src_img, depth, pose, K[None], invert_intrinsics(K)[None]
        )
        w = np.asarray(warped[0])
        valid = (np.abs(w).sum(-1) > 0) & (s["depths"][0] > 0)
        err = np.abs(w - ref_img)[valid]
        assert np.median(err) < 0.02, np.median(err)


def _label_boundaries(s):
    """Pixels near instance boundaries (where analytic normals are ambiguous)."""
    import scipy.ndimage as ndi

    seg = np.zeros(s["instance_segs"].shape[1:], np.int32)
    for i in range(int(s["planes_num"])):
        seg[s["instance_segs"][i] > 0] = i + 1
    edges = ndi.maximum_filter(seg, 9) != ndi.minimum_filter(seg, 9)
    return edges


class TestPipeline:
    def test_collate(self):
        ds = SyntheticScenes(3, 16, 16)
        batch = collate([ds[0], ds[1]])
        assert batch["images"].shape == (2, 3, 16, 16, 3)
        assert batch["planes_num"].shape == (2,)

    def test_normalize_roundtrip(self, rng):
        img = rng.random((4, 8, 8, 3)).astype(np.float32)
        back = denormalize_images(normalize_images(img))
        np.testing.assert_allclose(back, img, atol=1e-5)

    def test_prefetch_loader(self):
        ds = SyntheticScenes(8, 16, 16)
        loader = PrefetchLoader(ds, batch_size=4, num_workers=2, seed=1)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["images"].shape[0] == 4

    def test_prefetch_loader_error_propagates(self):
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = PrefetchLoader(Bad(), batch_size=2, num_workers=1)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)


class TestPrepTools:
    def test_make_camera_files(self, tmp_path):
        from cnmnet_tpu.data.prep import make_camera_files

        scene = tmp_path / "scene0000_00"
        (scene / "pose").mkdir(parents=True)
        (scene / "intrinsic").mkdir()
        K = np.asarray(
            [[1170.0, 0, 648, 0], [0, 1170.0, 484, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        )
        np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", K)
        pose = np.eye(4)
        pose[:3, 3] = [1.0, 2.0, 3.0]
        np.savetxt(scene / "pose" / "0.txt", pose)
        np.savetxt(scene / "pose" / "10.txt", pose)
        bad = pose.copy()
        bad[0, 0] = np.inf
        np.savetxt(scene / "pose" / "20.txt", bad)

        n = make_camera_files(str(scene), 256, 192)
        assert n == 2
        cam = load_cam_text((scene / "cameras" / "0_cam.txt").read_text())
        np.testing.assert_allclose(cam[0], np.linalg.inv(pose), atol=1e-5)
        assert cam[1, 0, 0] == pytest.approx(1170.0 * 256 / 1296, rel=1e-3)

    def test_prep_cameras_cli_entry(self, tmp_path, capsys):
        """`cli prep-cameras` over the same mock scene as the module test."""
        from cnmnet_tpu.cli import main

        scene = tmp_path / "scene0000_00"
        (scene / "pose").mkdir(parents=True)
        (scene / "intrinsic").mkdir()
        K = np.asarray(
            [[1170.0, 0, 648, 0], [0, 1170.0, 484, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
        )
        np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", K)
        np.savetxt(scene / "pose" / "0.txt", np.eye(4))
        assert main(["prep-cameras", "--scene-dir", str(scene)]) == 0
        assert "wrote 1 camera files" in capsys.readouterr().out
        assert (scene / "cameras" / "0_cam.txt").exists()

    def test_clean_plane_segmentation(self):
        from cnmnet_tpu.data.prep import clean_plane_segmentation

        H = W = 64
        K_inv = np.linalg.inv(np.asarray([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]]))
        # plane z = 2 (fronto-parallel): params = offset * normal = 2 * (0,0,1)
        planes = np.asarray([[0.0, 0.0, 2.0]])
        seg = np.zeros((H, W), np.int32)  # all labeled plane 0
        depth = np.full((H, W), 2.0)
        depth[:, :16] = 3.0  # inconsistent band
        out = clean_plane_segmentation(seg, planes, depth, K_inv)
        assert np.all(out[:, 20:] == 0)
        assert np.all(out[:, :16] == 20)

    def test_make_train_list(self, tmp_path):
        from cnmnet_tpu.data.prep import make_train_list

        root = tmp_path
        scene = root / "scene0000_00"
        for sub in ("rgb", "depth", "cameras"):
            (scene / sub).mkdir(parents=True)
        try:
            import cv2
        except ImportError:
            pytest.skip("cv2 required")
        E = np.eye(4)
        K = np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        for fid in (0, 10, 20, 30):
            cv2.imwrite(str(scene / "rgb" / f"{fid}.jpg"), np.full((48, 64, 3), 128, np.uint8))
            cv2.imwrite(
                str(scene / "depth" / f"{fid}.png"),
                np.full((48, 64), 2000, np.uint16),
            )
            (scene / "cameras" / f"{fid}_cam.txt").write_text(write_cam_text(E, K))
        out = root / "list.txt"
        n = make_train_list(
            str(root), str(out), interval=10, view_num=3, frame_stride=5,
            require_planes=False,
        )
        # only fid=10 and 20 have both +-10 neighbors
        assert n == 2
        assert out.read_text().split() == ["scene0000_00", "10", "scene0000_00", "20"]

    def test_train_list_quality_gates(self, tmp_path):
        """The reference's annotation-quality gates (`scannet/make_list.py:
        38-122`): plane-fit-error threshold, NaN normal mats, single-label
        segs, and empty plane params each reject a frame's whole window."""
        from cnmnet_tpu.data.prep import make_train_list

        try:
            import cv2
            import scipy.io
        except ImportError:
            pytest.skip("cv2+scipy required")
        root = tmp_path
        scene = root / "scene0000_00"
        for sub in ("rgb", "depth", "cameras", "planercnn_seg_003",
                    "planercnn_para_003", "planercnn_error_003", "normal"):
            (scene / sub).mkdir(parents=True)
        E = np.eye(4)
        K = np.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        good_normal = dict(
            nx=np.zeros((8, 8)), ny=np.zeros((8, 8)), nz=np.ones((8, 8))
        )
        seg = np.zeros((48, 64), np.uint8)
        seg[:16] = 1  # two labels -> has planes
        for fid in range(0, 80, 10):
            cv2.imwrite(str(scene / "rgb" / f"{fid}.jpg"),
                        np.full((48, 64, 3), 128, np.uint8))
            cv2.imwrite(str(scene / "depth" / f"{fid}.png"),
                        np.full((48, 64), 2000, np.uint16))
            (scene / "cameras" / f"{fid}_cam.txt").write_text(write_cam_text(E, K))
            cv2.imwrite(str(scene / "planercnn_seg_003" / f"{fid}.png"), seg)
            np.save(scene / "planercnn_para_003" / f"{fid}.npy",
                    np.asarray([[0.0, 0.0, 2.0]]))
            np.save(scene / "planercnn_error_003" / f"{fid}.npy",
                    {"error": 0.05})
            scipy.io.savemat(scene / "normal" / f"{fid}.mat", good_normal)

        kw = dict(interval=10, view_num=3, frame_stride=5,
                  error_threshold=0.7, check_normals=True)
        out = root / "list.txt"
        assert make_train_list(str(root), str(out), **kw) == 6  # fids 10..60

        # plane-fit error above threshold on a SOURCE view kills the window
        np.save(scene / "planercnn_error_003" / "20.npy", {"error": 0.9})
        assert make_train_list(str(root), str(out), **kw) == 3  # 40,50,60 left

        # NaN normal on a source view (70) kills the window of ref 60
        bad = dict(good_normal)
        bad["ny"] = np.full((8, 8), np.nan)
        scipy.io.savemat(scene / "normal" / "70.mat", bad)
        assert make_train_list(str(root), str(out), **kw) == 2  # 40, 50

        # single-label seg (no planes) rejects a reference frame
        cv2.imwrite(str(scene / "planercnn_seg_003" / "50.png"),
                    np.zeros((48, 64), np.uint8))
        assert make_train_list(str(root), str(out), **kw) == 1  # 40
        assert out.read_text().split() == ["scene0000_00", "40"]

        # empty plane params reject too
        np.save(scene / "planercnn_para_003" / "40.npy", np.zeros((0, 3)))
        assert make_train_list(str(root), str(out), **kw) == 0


class TestHostSharding:
    """Multi-host input sharding: PrefetchLoader shard_index/shard_count."""

    class Recorder:
        def __init__(self, n):
            self.n = n
            self.seen = []

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.seen.append(int(i))
            return {"x": np.asarray([i], np.int64)}

    def test_shards_partition_disjointly(self):
        from cnmnet_tpu.data.pipeline import PrefetchLoader

        n, hosts = 37, 3
        all_seen, batch_counts = [], []
        for h in range(hosts):
            ds = self.Recorder(n)
            loader = PrefetchLoader(
                ds, batch_size=2, num_workers=1, seed=7,
                shard_index=h, shard_count=hosts, drop_last=False,
            )
            batches = list(loader)
            assert len(batches) == len(loader)
            batch_counts.append(len(batches))
            all_seen.append(set(ds.seen))
        # every host yields the SAME number of batches (a straggler batch
        # would dispatch a collective step its peers never join)
        assert len(set(batch_counts)) == 1
        # disjoint across hosts; shards truncate to the common length, so
        # coverage misses at most shard_count-1 samples per epoch
        assert all_seen[0] & all_seen[1] == set()
        assert all_seen[0] & all_seen[2] == set()
        assert all_seen[1] & all_seen[2] == set()
        covered = all_seen[0] | all_seen[1] | all_seen[2]
        assert len(covered) == hosts * (n // hosts)
        assert covered <= set(range(n))

    def test_uneven_shards_yield_equal_batch_counts(self):
        from cnmnet_tpu.data.pipeline import PrefetchLoader

        # n=9, 2 hosts, batch_size=1: without truncation host 0 would
        # produce 5 batches vs host 1's 4 and hang the rendezvous
        counts = []
        for h in range(2):
            loader = PrefetchLoader(
                self.Recorder(9), batch_size=1, num_workers=1, seed=0,
                shard_index=h, shard_count=2, drop_last=False,
            )
            counts.append(len(list(loader)))
        assert counts == [4, 4]

    def test_single_shard_default_unchanged(self):
        from cnmnet_tpu.data.pipeline import PrefetchLoader

        ds = self.Recorder(10)
        loader = PrefetchLoader(ds, batch_size=2, num_workers=1, shuffle=False)
        assert len(list(loader)) == 5
        assert sorted(ds.seen) == list(range(10))
