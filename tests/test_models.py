"""Model shape/structure tests on tiny inputs (CPU-fast)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnmnet_tpu.models import CNMModel, DepthNet, DepthRefineNet


H, W = 32, 64  # divisible by 32, small enough for CPU


def tiny_cams(B, V, rng):
    cams = np.zeros((B, V, 2, 4, 4), np.float32)
    for b in range(B):
        for v in range(V):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = 0.05 * v
            cams[b, v, 0] = E
            cams[b, v, 1, :3, :3] = np.asarray(
                [[W / 2, 0, W / 2], [0, W / 2, H / 2], [0, 0, 1]]
            )
    return jnp.asarray(cams)


class TestDepthNet:
    def test_output_shapes_and_ranges(self, rng):
        model = DepthNet(idepth_scale=3.0)
        ref = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
        vol = jnp.asarray(rng.random((1, H, W, 64)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), ref, vol, train=False)
        (disps, iconv), _ = model.apply(
            variables, ref, vol, train=True, mutable=["batch_stats"]
        )
        assert disps[0].shape == (1, H, W, 1)
        assert disps[1].shape == (1, H // 2, W // 2, 1)
        assert disps[2].shape == (1, H // 4, W // 4, 1)
        assert disps[3].shape == (1, H // 8, W // 8, 1)
        assert iconv.shape == (1, H, W, 64)
        for d in disps:
            d = np.asarray(d)
            assert d.min() >= 0.0 and d.max() <= 3.0  # sigmoid * idepth_scale

    def test_param_count_matches_architecture(self):
        """Spot-check the channel arithmetic via conv kernel shapes."""
        model = DepthNet()
        ref = jnp.zeros((1, H, W, 3))
        vol = jnp.zeros((1, H, W, 64))
        variables = model.init(jax.random.PRNGKey(0), ref, vol, train=False)
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        kernels = {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in flat
            if leaf.ndim == 4
        }
        # encoder first conv: 67 -> 128, k7
        first = [s for n, s in kernels.items() if s[2] == 67]
        assert (7, 7, 67, 128) in first
        # iconv3 input must be 256+256+1 = 513
        assert any(s[2] == 513 for s in kernels.values())
        # iconv2: 128+128+1 = 257; iconv1: 64+1 = 65
        assert any(s[2] == 257 for s in kernels.values())
        assert any(s[2] == 65 for s in kernels.values())


class TestRefineNet:
    def test_shapes(self, rng):
        model = DepthRefineNet(idepth_scale=3.0)
        idepth = jnp.asarray(rng.random((1, H, W, 1)), jnp.float32)
        iconv = jnp.asarray(rng.standard_normal((1, H, W, 64)), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), idepth, idepth, iconv, iconv, train=False
        )
        (disp, prob), _ = model.apply(
            variables, idepth, idepth * 0.5, iconv, iconv, train=True,
            mutable=["batch_stats"],
        )
        assert disp.shape == (1, H, W, 1)
        assert prob.shape == (1, H, W, 1)
        assert float(jnp.max(prob)) <= 1.0 and float(jnp.min(prob)) >= 0.0


class TestCNMModel:
    @pytest.mark.parametrize("num_sources", [1, 2, 4])
    def test_views(self, rng, num_sources):
        V = 1 + num_sources
        model = CNMModel(num_planes=16, cv_backend="jnp")
        images = jnp.asarray(rng.standard_normal((1, V, H, W, 3)), jnp.float32)
        cams = tiny_cams(1, V, rng)
        variables = model.init(jax.random.PRNGKey(0), images, cams, train=False)
        out, _ = model.apply(
            variables, images, cams, train=True, mutable=["batch_stats"]
        )
        assert out.disps[0].shape == (1, num_sources, H, W, 1)
        assert out.iconv.shape == (1, num_sources, H, W, 64)
        if num_sources == 1:
            assert out.idepth_refined is None
        else:
            assert out.idepth_refined.shape == (1, H, W, 1)
            assert out.prob_map.shape == (1, H, W, 1)

    def test_group_averaging_four_sources(self, rng):
        """With 4 identical sources the group averages equal the per-source disp."""
        model = CNMModel(num_planes=8, cv_backend="jnp")
        img = jnp.asarray(rng.standard_normal((1, 1, H, W, 3)), jnp.float32)
        images = jnp.concatenate([img] * 5, axis=1)
        cams = tiny_cams(1, 5, rng)
        # make all source cams identical so pairs match exactly
        cams = cams.at[:, 2:].set(cams[:, 1:2])
        variables = model.init(jax.random.PRNGKey(0), images, cams, train=False)
        out, _ = model.apply(
            variables, images, cams, train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(out.idepth_g1), np.asarray(out.disps[0][:, 0]), atol=1e-5
        )


class TestMultiInConv:
    """The split-conv rewrite of conv(concat(...)) must be exact (round 2)."""

    def test_matches_concat_conv(self, rng):
        from cnmnet_tpu.models.layers import ConvNormAct

        parts = [
            jnp.asarray(rng.standard_normal((2, 8, 16, c)), jnp.float32)
            for c in (3, 64)
        ]
        mod = ConvNormAct(32, 7, norm="batch", dtype=jnp.float32)
        vs = mod.init(jax.random.PRNGKey(0), tuple(parts), train=False)
        got = mod.apply(vs, tuple(parts), train=False)
        # identical params drive the joint conv on the concat
        want = mod.apply(vs, jnp.concatenate(parts, axis=-1), train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_param_tree_unchanged(self, rng):
        """Tuple and concat inputs create the same single kernel param —
        round-1 checkpoints keep loading."""
        from cnmnet_tpu.models.layers import ConvNormAct

        parts = (
            jnp.zeros((1, 8, 16, 3), jnp.float32),
            jnp.zeros((1, 8, 16, 64), jnp.float32),
        )
        mod = ConvNormAct(32, 7)
        v_split = mod.init(jax.random.PRNGKey(0), parts, train=False)
        v_joint = mod.init(
            jax.random.PRNGKey(0), jnp.concatenate(parts, axis=-1), train=False
        )
        assert jax.tree_util.tree_structure(v_split) == jax.tree_util.tree_structure(v_joint)
        assert v_split["params"]["Conv_0"]["kernel"].shape == (7, 7, 67, 32)


class TestStride2Impls:
    """model.stride2 selects exact rewrites of the stride-2 convs:
    "s2d" = space-to-depth + dense stride-1 (different forward lowering),
    "psg" = plain forward with a phase-split input-gradient custom VJP.

    Both must be exact (same params, outputs, AND VJPs) so the knob can be
    toggled on any checkpoint; they exist purely as backward-pass lowering
    trades (reference: the stride-2 encoder convs in the torch models,
    /root/reference/depthnet/depthNet_model.py down_conv blocks)."""

    @pytest.mark.parametrize("impl", ["s2d", "psg"])
    @pytest.mark.parametrize("k", [3, 5, 7])
    def test_matches_strided_conv_and_grads(self, rng, k, impl):
        import flax.linen as nn
        from cnmnet_tpu.models.layers import (
            PhaseSplitGradConv, SpaceToDepthConv, conv_init,
        )

        x = jnp.asarray(rng.standard_normal((2, 12, 20, 9)), jnp.float32)
        ref = nn.Conv(
            16, (k, k), strides=2, padding=(k - 1) // 2, use_bias=False,
            kernel_init=conv_init,
        )
        pv = ref.init(jax.random.PRNGKey(0), x)
        mod = {"s2d": SpaceToDepthConv, "psg": PhaseSplitGradConv}[impl](16, k)
        np.testing.assert_allclose(
            np.asarray(mod.apply(pv, x)), np.asarray(ref.apply(pv, x)),
            atol=1e-5, rtol=1e-5,
        )
        # weight and input cotangents agree too (the whole point is the
        # backward — it must stay the same function)
        loss_ref = lambda p, x: jnp.sum(jnp.sin(ref.apply(p, x)))
        loss_mod = lambda p, x: jnp.sum(jnp.sin(mod.apply(p, x)))
        gw_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(pv, x)
        gw_mod, gx_mod = jax.grad(loss_mod, argnums=(0, 1))(pv, x)
        np.testing.assert_allclose(
            np.asarray(gw_mod["params"]["kernel"]),
            np.asarray(gw_ref["params"]["kernel"]), atol=5e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(gx_mod), np.asarray(gx_ref), atol=1e-5, rtol=1e-4
        )

    @pytest.mark.parametrize("impl", ["s2d", "psg"])
    def test_full_model_equivalence_and_param_tree(self, rng, impl):
        """CNMModel(stride2=impl) computes the same function from the same
        checkpoint tree as the default model."""
        images = jnp.asarray(rng.standard_normal((1, 3, H, W, 3)), jnp.float32)
        cams = tiny_cams(1, 3, rng)
        base = CNMModel(num_planes=16, cv_backend="jnp")
        vs = base.init(jax.random.PRNGKey(0), images, cams, train=False)
        alt = CNMModel(num_planes=16, cv_backend="jnp", stride2=impl)
        vs2 = alt.init(jax.random.PRNGKey(0), images, cams, train=False)
        assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vs2)
        out_base = base.apply(vs, images, cams, train=False)
        out_alt = alt.apply(vs, images, cams, train=False)
        np.testing.assert_allclose(
            np.asarray(out_alt.idepth_refined),
            np.asarray(out_base.idepth_refined), atol=2e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out_alt.disps[0]), np.asarray(out_base.disps[0]),
            atol=2e-4, rtol=1e-3,
        )

    def test_psg_train_grads_match_end_to_end(self, rng):
        """Full-model parameter gradients with stride2="psg" equal the
        default model's (the custom VJP composes with BN/remat/losses)."""
        images = jnp.asarray(rng.standard_normal((1, 3, H, W, 3)), jnp.float32)
        cams = tiny_cams(1, 3, rng)
        base = CNMModel(num_planes=16, cv_backend="jnp")
        vs = base.init(jax.random.PRNGKey(0), images, cams, train=True)
        psg = CNMModel(num_planes=16, cv_backend="jnp", stride2="psg")

        def loss(model, params):
            out, _ = model.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                images, cams, train=True, mutable=["batch_stats"],
            )
            return jnp.mean(out.idepth_refined) + jnp.mean(out.disps[0])

        g_base = jax.grad(lambda p: loss(base, p))(vs["params"])
        g_psg = jax.grad(lambda p: loss(psg, p))(vs["params"])
        flat_b = jax.tree_util.tree_leaves(g_base)
        flat_p = jax.tree_util.tree_leaves(g_psg)
        for a, b in zip(flat_b, flat_p):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-3
            )
