"""uint8 wire format: in-graph normalization parity and end-to-end use.

The reference ships host-normalized float32 images (`scannet/preprocess.py:
16-26`); the TPU build optionally ships raw uint8 RGB (4x smaller H2D) and
folds the ImageNet affine into the compiled program. These tests pin the
two wire formats to the same numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnmnet_tpu.config import Config
from cnmnet_tpu.data.pipeline import (
    denormalize_images,
    normalize_images,
    quantize_images_u8,
)
from cnmnet_tpu.ops.images import prepare_images

H, W = 32, 64


class TestPrepareImages:
    def test_uint8_matches_host_normalize(self):
        rng = np.random.default_rng(0)
        u8 = rng.integers(0, 256, size=(2, 3, H, W, 3), dtype=np.uint8)
        got = np.asarray(prepare_images(jnp.asarray(u8)))
        want = normalize_images(u8.astype(np.float32) / 255.0)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_float_passthrough(self):
        x = np.random.default_rng(1).normal(size=(1, H, W, 3)).astype(np.float32)
        got = np.asarray(prepare_images(jnp.asarray(x)))
        np.testing.assert_array_equal(got, x)

    def test_jittable_both_dtypes(self):
        f = jax.jit(prepare_images)
        u8 = np.full((1, H, W, 3), 128, np.uint8)
        f32 = np.zeros((1, H, W, 3), np.float32)
        assert f(u8).dtype == jnp.float32
        assert f(f32).dtype == jnp.float32

    def test_quantize_roundtrip(self):
        rng = np.random.default_rng(2)
        img01 = rng.random((2, H, W, 3)).astype(np.float32)
        u8 = quantize_images_u8(img01)
        assert u8.dtype == np.uint8
        got = np.asarray(prepare_images(jnp.asarray(u8)))
        want = normalize_images(img01)
        # half-step quantization, amplified by 1/std <= 1/0.225
        np.testing.assert_allclose(got, want, atol=(0.5 / 255) / 0.224 + 1e-5)

    def test_denormalize_uint8(self):
        u8 = np.asarray([[[0, 128, 255]]], np.uint8)
        got = denormalize_images(u8)
        np.testing.assert_allclose(got, [[[0.0, 128 / 255, 1.0]]], atol=1e-6)


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = Config()
    cfg.model.num_planes = 8
    cfg.model.k_size = 5
    cfg.dataset.batch_size = 2
    return cfg


@pytest.fixture(scope="module")
def wire_batches():
    """The same synthetic batch in both wire formats (u8 and the
    host-normalized float of the SAME quantized pixels)."""
    from cnmnet_tpu.data.pipeline import collate
    from cnmnet_tpu.data.synthetic import SyntheticScenes

    ds = SyntheticScenes(num_samples=2, height=H, width=W, view_num=3)
    batch = collate([ds[0], ds[1]])
    batch.pop("index")
    u8 = dict(batch)
    u8["images"] = quantize_images_u8(batch["images"])
    f32 = dict(batch)
    f32["images"] = normalize_images(u8["images"].astype(np.float32) / 255.0)
    return u8, f32


class TestEndToEnd:
    def test_forward_parity_across_wire_formats(self, tiny_cfg, wire_batches):
        from cnmnet_tpu.train.state import build_model, create_train_state

        u8, f32 = wire_batches
        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), u8)
        model = build_model(tiny_cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def fwd(images):
            out = model.apply(
                variables, prepare_images(jnp.asarray(images)),
                jnp.asarray(u8["cams"]), train=False,
            )
            return out.idepth_refined

        a = np.asarray(fwd(u8["images"]))
        b = np.asarray(fwd(f32["images"]))
        np.testing.assert_allclose(a, b, atol=2e-4)

    def test_train_step_on_uint8_batch(self, tiny_cfg, wire_batches):
        from cnmnet_tpu.train.loop import make_train_step
        from cnmnet_tpu.train.state import create_train_state

        u8, _ = wire_batches
        batch = {k: jnp.asarray(v) for k, v in u8.items()}
        assert batch["images"].dtype == jnp.uint8
        state = create_train_state(tiny_cfg, jax.random.PRNGKey(0), batch)
        step = make_train_step(tiny_cfg)
        losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0], losses

    def test_synthetic_batches_wire_dtype(self):
        from cnmnet_tpu.data.synthetic import SyntheticScenes

        ds = SyntheticScenes(num_samples=2, height=H, width=W, view_num=3)
        b_u8 = next(ds.batches(2, wire_dtype="uint8"))
        assert b_u8["images"].dtype == np.uint8
        b_f32 = next(ds.batches(2))
        assert b_f32["images"].dtype == np.float32
        got = np.asarray(prepare_images(jnp.asarray(b_u8["images"])))
        np.testing.assert_allclose(
            got, b_f32["images"], atol=(0.5 / 255) / 0.224 + 1e-5
        )
