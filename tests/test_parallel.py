"""Distribution-layer tests on the 8-virtual-device CPU mesh.

The acceptance contract from SURVEY.md §5: sharded ops must be
bit-equivalent (within fp reassociation) to their unsharded references.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cnmnet_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from cnmnet_tpu.parallel.sharding import halo_exchange_rows
from cnmnet_tpu.parallel.tiled_ops import cost_volume_tiled, depth_to_normal_tiled


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=4, tile=2)
        assert dict(mesh.shape) == {"data": 4, "tile": 2}
        mesh = make_mesh(data=-1, tile=2)
        assert mesh.shape["data"] * 2 == jax.device_count()

    def test_batch_sharding_spec(self):
        mesh = make_mesh(data=4, tile=2)
        s = batch_sharding(mesh, ndim=4, spatial_dim=1)
        assert s.spec == P("data", "tile", None, None)
        assert replicated(mesh).spec == P()


class TestHaloExchange:
    @pytest.mark.parametrize("tile", [2, 4])
    def test_matches_padded_neighbors(self, rng, tile):
        mesh = make_mesh(data=8 // tile, tile=tile)
        H, W, C = 16, 8, 3
        halo = 2
        x = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)

        from jax import shard_map

        fn = shard_map(
            lambda xs: halo_exchange_rows(xs, halo, "tile"),
            mesh=mesh,
            in_specs=(P(None, "tile", None, None),),
            out_specs=P(None, "tile", None, None),
        )
        out = np.asarray(fn(x))
        h_local = H // tile
        xp = np.pad(np.asarray(x), ((0, 0), (halo, halo), (0, 0), (0, 0)))
        # shard s rows in the output: [s*(h_local+2*halo), ...): equals padded
        # global rows [s*h_local, s*h_local + h_local + 2*halo)
        for s in range(tile):
            got = out[:, s * (h_local + 2 * halo) : (s + 1) * (h_local + 2 * halo)]
            want = xp[:, s * h_local : s * h_local + h_local + 2 * halo]
            np.testing.assert_allclose(got, want, atol=0)


class TestTiledNormals:
    def test_matches_unsharded(self, rng):
        from cnmnet_tpu.geometry.camera import invert_intrinsics
        from cnmnet_tpu.ops import depth_to_normal

        mesh = make_mesh(data=2, tile=4)
        B, H, W = 2, 32, 16
        depth = jnp.asarray(
            2.0 + 0.2 * rng.standard_normal((B, H, W)), jnp.float32
        )
        K = jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
        K_inv = jnp.broadcast_to(invert_intrinsics(K), (B, 3, 3))

        want, _ = depth_to_normal(depth, K_inv, k_size=9)
        got = depth_to_normal_tiled(depth, K_inv, mesh, k_size=9)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_invalid_rows_at_shard_boundary(self, rng):
        """Zero-depth rows straddling a shard boundary must mask identically."""
        from cnmnet_tpu.geometry.camera import invert_intrinsics
        from cnmnet_tpu.ops import depth_to_normal

        mesh = make_mesh(data=1, tile=8)
        B, H, W = 1, 32, 16
        depth = np.full((B, H, W), 2.0, np.float32)
        depth[:, 3:5] = 0.0  # invalid band at the first shard boundary
        depth = jnp.asarray(depth)
        K = jnp.asarray([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]])
        K_inv = jnp.broadcast_to(invert_intrinsics(K), (B, 3, 3))
        want, _ = depth_to_normal(depth, K_inv, k_size=5)
        got = depth_to_normal_tiled(depth, K_inv, mesh, k_size=5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestTiledCostVolume:
    def test_matches_unsharded(self, rng):
        from cnmnet_tpu.geometry.camera import Camera, plane_sweep_terms
        from cnmnet_tpu.ops import cost_volume_from_cameras, idepth_hypotheses
        from tests.test_geometry import make_E, make_K

        mesh = make_mesh(data=2, tile=4)
        B, H, W = 2, 16, 8
        ref = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
        K = make_K(fx=10.0, fy=10.0, cx=W / 2, cy=H / 2)
        E1 = jnp.stack([jnp.asarray(make_E())] * B)
        E2 = jnp.stack([jnp.asarray(make_E(t=(0.1, 0.05, 0.0)))] * B)
        Ks = jnp.stack([K] * B)
        c1 = Camera(extrinsic=E1, intrinsic=Ks)
        c2 = Camera(extrinsic=E2, intrinsic=Ks)

        want = cost_volume_from_cameras(ref, src, c1, c2, 3.0, 8)
        KRKiUV, KT = plane_sweep_terms(c1, c2, H, W)
        got = cost_volume_tiled(
            ref, src, KRKiUV, KT, idepth_hypotheses(3.0, 8), mesh
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestGspmdHaloMiscompile:
    """Pins an XLA GSPMD correctness bug (jax 0.9): conv halo exchange only
    reaches ADJACENT shards, so a spatially-sharded windowed op whose
    per-shard extent is below the kernel reach SILENTLY computes wrong
    values — no error, no fallback. `parallel/sharding.tile_partition_safe`
    guards every tile-sharding entry point (cli eval, serve, train step)
    against the measured-unsafe zone. If `test_bug_still_present` ever
    FAILS, the XLA bug was fixed upstream — relax the guard thresholds."""

    def _stride2_diff(self, H, k):
        from jax import lax
        from jax.sharding import NamedSharding

        mesh = make_mesh(data=2, tile=2, devices=jax.devices()[:4])
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, H, 2 * H, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, 8, 8)) * 0.1, jnp.float32)
        p = (k - 1) // 2

        def conv(t):
            dn = lax.conv_dimension_numbers(
                t.shape, w.shape, ("NHWC", "HWIO", "NHWC")
            )
            return lax.conv_general_dilated(
                t, w, (2, 2), [(p, p), (p, p)], dimension_numbers=dn
            )

        a = np.asarray(jax.jit(conv)(x))
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "tile")))
        b = np.asarray(jax.jit(conv)(xs))
        return float(np.abs(a - b).max())

    def test_bug_still_present(self):
        # per-shard extent 2 < 2*(k-1)=4 for a stride-2 k=3 conv: wrong
        assert self._stride2_diff(H=4, k=3) > 0.1

    def test_safe_zone_is_exact(self):
        # per-shard extent 4 >= 2*(k-1): bit-exact
        assert self._stride2_diff(H=8, k=3) == 0.0

    def test_tile_partition_safe_classification(self):
        from cnmnet_tpu.parallel.sharding import tile_partition_safe

        assert tile_partition_safe(480, 2) == (True, "")   # native-res train
        assert tile_partition_safe(128, 2)[0]              # smallest safe x2
        assert not tile_partition_safe(64, 2)[0]           # deep convs unsafe
        assert not tile_partition_safe(32, 2)[0]           # the test shapes
        assert not tile_partition_safe(481, 2)[0]          # indivisible
        safe, reason = tile_partition_safe(32, 2)
        assert "GSPMD" in reason or "per-shard" in reason


class TestShardedBatchNorm:
    def test_bn_stats_are_global_under_gspmd(self, rng):
        """jit with a batch-sharded input must produce the same BN statistics
        as the unsharded run (GSPMD sync-BN for free)."""
        from flax import linen as nn

        mesh = make_mesh(data=8, tile=1)

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=True):
                return nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5
                )(x)

        x = jnp.asarray(rng.standard_normal((16, 4, 4, 3)), jnp.float32)
        m = M()
        variables = m.init(jax.random.PRNGKey(0), x, train=False)

        def run(v, xx):
            y, mut = m.apply(v, xx, train=True, mutable=["batch_stats"])
            return y, mut["batch_stats"]

        y_ref, stats_ref = jax.jit(run)(variables, x)

        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        y_sh, stats_sh = jax.jit(run)(vs, xs)

        np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(stats_sh), jax.tree_util.tree_leaves(stats_ref)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestShardedModelForward:
    """Full-model equivalence under mesh sharding.

    Criterion: forward values within fp-reassociation amplification bounds.
    BN batch statistics are psums whose reassociation differs per sharding
    (~1e-6); each of the ~10 BN layers renormalizes on those stats, so the
    output difference compounds to ~1e-3 — measured and bounded here, NOT
    bit-equality (gradients amplify further and are compared statistically
    in training, as with any sync-BN data-parallel system). The cost-volume
    op itself is bit-exact under sharding (asserted below)."""

    def _setup(self):
        import jax.numpy as jnp

        from cnmnet_tpu.config import Config
        from cnmnet_tpu.train.state import create_train_state
        from __graft_entry__ import _tiny_batch

        cfg = Config()
        cfg.model.num_planes = 8
        cfg.model.k_size = 5
        batch = {k: jnp.asarray(v) for k, v in _tiny_batch(2, 32, 64).items()}
        state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        return state, batch

    @pytest.mark.parametrize("data,tile", [(2, 1), (2, 4)])
    def test_forward_within_reassociation_bounds(self, data, tile):
        import jax.numpy as jnp

        state, batch = self._setup()
        mesh = make_mesh(data=data, tile=tile, devices=jax.devices()[: data * tile])
        h_dims = {"images": 2, "depths": 2, "disparity": 1, "normals": 1,
                  "instance_segs": 2}

        @jax.jit
        def fwd(p, bs, bt):
            out, _ = state.apply_fn(
                {"params": p, "batch_stats": bs},
                bt["images"], bt["cams"], train=True, mutable=["batch_stats"],
            )
            return out.disps[0], out.idepth_refined

        d_a, r_a = fwd(state.params, state.batch_stats, batch)
        sb = {}
        for k, v in batch.items():
            spec = ["data"] + [None] * (v.ndim - 1)
            if tile > 1 and k in h_dims:
                spec[h_dims[k]] = "tile"
            sb[k] = jax.device_put(v, NamedSharding(mesh, P(*spec)))
        sp = jax.device_put(state.params, NamedSharding(mesh, P()))
        ss = jax.device_put(state.batch_stats, NamedSharding(mesh, P()))
        d_b, r_b = fwd(sp, ss, sb)
        assert float(jnp.max(jnp.abs(d_a - d_b))) < 5e-3
        assert float(jnp.max(jnp.abs(r_a - r_b))) < 2e-2

    def test_spatial_partitioning_beyond_flagship_resolution(self):
        """Pure spatial (tile=8) partitioning of the full conv stack at
        224x384 — larger than the flagship 192x256 (ROADMAP 11): GSPMD must
        partition every conv/upsample exactly, with halo transfers, and
        match the unsharded forward. Eval mode (running BN stats) keeps the
        comparison free of psum-reassociation noise, so the bound is tight."""
        import jax.numpy as jnp

        from cnmnet_tpu.models import CNMModel
        from __graft_entry__ import _tiny_batch

        H, W = 224, 384
        model = CNMModel(num_planes=4, dtype=jnp.float32)
        batch = {k: jnp.asarray(v) for k, v in _tiny_batch(1, H, W).items()}
        variables = model.init(
            jax.random.PRNGKey(0), batch["images"], batch["cams"], train=False
        )

        @jax.jit
        def fwd(images, cams):
            out = model.apply(variables, images, cams, train=False)
            return out.disps[0], out.idepth_refined

        d_a, r_a = fwd(batch["images"], batch["cams"])

        mesh = make_mesh(data=1, tile=8, devices=jax.devices())
        img_sh = NamedSharding(mesh, P("data", None, "tile", None, None))
        cam_sh = NamedSharding(mesh, P("data", None, None, None, None))
        d_b, r_b = fwd(
            jax.device_put(batch["images"], img_sh),
            jax.device_put(batch["cams"], cam_sh),
        )
        assert float(jnp.max(jnp.abs(d_a - d_b))) < 1e-5
        # idepth_refined passes through a second full net (values up to
        # idepth_scale=3): partition-boundary fp reassociation measured
        # 1.7e-4 max — relative ~6e-5, no halo/partitioning error signature.
        assert float(jnp.max(jnp.abs(r_a - r_b))) < 1e-3

    def test_cost_volume_bit_exact_under_sharding(self):
        import jax.numpy as jnp

        from cnmnet_tpu.geometry.camera import camera_from_array
        from cnmnet_tpu.ops.cost_volume import cost_volume_from_cameras
        from __graft_entry__ import _tiny_batch

        batch = {k: jnp.asarray(v) for k, v in _tiny_batch(2, 32, 64).items()}
        mesh = make_mesh(data=2, tile=1, devices=jax.devices()[:2])

        @jax.jit
        def vol(bt):
            return cost_volume_from_cameras(
                bt["images"][:, 0], bt["images"][:, 1],
                camera_from_array(bt["cams"][:, 0]),
                camera_from_array(bt["cams"][:, 1]), 3.0, 8,
            )

        a = vol(batch)
        sb = {
            k: jax.device_put(
                v, NamedSharding(mesh, P(*(["data"] + [None] * (v.ndim - 1))))
            )
            for k, v in batch.items()
        }
        b = vol(sb)
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


class TestUpsample:
    def test_conv_upsample_matches_resize(self, rng):
        import jax.numpy as jnp

        from cnmnet_tpu.models.layers import upsample2x_bilinear

        x = jnp.asarray(rng.standard_normal((2, 6, 8, 3)), jnp.float32)
        ref = jax.image.resize(x, (2, 12, 16, 3), method="bilinear")
        got = upsample2x_bilinear(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


class TestPlaneMetrics:
    def test_eval_iou(self):
        from cnmnet_tpu.ops.plane_metrics import eval_iou

        a = np.zeros((4, 4), bool)
        b = np.zeros((4, 4), bool)
        assert eval_iou(a, b) == 1.0
        a[:2] = True
        b[1:3] = True
        assert eval_iou(a, b) == pytest.approx(4 / 12)

    def test_plane_prediction_perfect(self):
        from cnmnet_tpu.ops.plane_metrics import eval_plane_prediction

        # label-map convention: planes 0..n-1 plus a non-planar label
        seg = np.zeros((8, 8), np.int32)
        seg[:, 4:] = 1
        seg[0, 0] = 20  # non-planar pixel (the reference counts uniques - 1)
        depth = np.full((8, 8), 2.0)
        pixel_recalls, stats = eval_plane_prediction(seg, seg, depth, depth)
        assert pixel_recalls[0] == pytest.approx(1.0)
        matched, gt_n, pred_n = stats[0]
        assert matched == gt_n == 2

    def test_recall_normal(self):
        from cnmnet_tpu.ops.plane_metrics import eval_plane_and_pixel_recall_normal

        seg = np.full((8, 8), 20, np.int32)
        seg[:4] = 0
        params = np.zeros((20, 3))
        params[0] = [0, 0, 1]
        plane_recall, pixel_recall = eval_plane_and_pixel_recall_normal(
            seg, seg, params, params
        )
        # angle 0 < all thresholds except the 0.0 one
        assert plane_recall[0, -1] == 1.0
        assert pixel_recall[0, -1] == pytest.approx(1.0)
