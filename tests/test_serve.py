"""Serving layer: session bucketing/padding and request micro-batching.

SURVEY has no reference counterpart (the reference evals one frame at a
time); these pin the deployment contract: bucket padding never changes
results, chunking handles any batch size, both wire formats work, and the
micro-batcher coalesces without reordering results.
"""

import glob
import os

import numpy as np
import pytest

from cnmnet_tpu.config import Config
from cnmnet_tpu.data.pipeline import collate, quantize_images_u8
from cnmnet_tpu.data.synthetic import SyntheticScenes
from cnmnet_tpu.serve import InferenceSession, MicroBatcher, _next_bucket

H, W = 32, 64


def _cfg():
    cfg = Config()
    cfg.model.num_planes = 8
    cfg.model.k_size = 5
    return cfg


@pytest.fixture(scope="module")
def frames():
    ds = SyntheticScenes(num_samples=6, height=H, width=W, view_num=3)
    batch = collate([ds[i] for i in range(6)])
    return (
        quantize_images_u8(batch["images"]),  # uint8 wire
        batch["cams"].astype(np.float32),
    )


@pytest.fixture(scope="module")
def session():
    return InferenceSession(_cfg(), batch_buckets=(1, 4))


class TestBuckets:
    def test_next_bucket(self):
        assert _next_bucket(1, (1, 4, 8)) == 1
        assert _next_bucket(3, (1, 4, 8)) == 4
        assert _next_bucket(8, (1, 4, 8)) == 8
        assert _next_bucket(9, (1, 4, 8)) == 8  # top bucket -> chunking

    def test_padding_matches_unpadded(self, session, frames):
        images, cams = frames
        # batch 3 pads to bucket 4; per-sample results must equal batch-1 runs
        out3 = session.predict(images[:3], cams[:3])
        for i in range(3):
            out1 = session.predict(images[i : i + 1], cams[i : i + 1])
            np.testing.assert_allclose(
                out3["idepth"][i], out1["idepth"][0], atol=1e-4
            )
        assert out3["depth"].shape == (3, H, W)
        assert out3["normal"].shape == (3, H, W, 3)
        assert out3["prob"].shape == (3, H, W)

    def test_chunking_beyond_top_bucket(self, session, frames):
        images, cams = frames
        out6 = session.predict(images, cams)  # 6 > top bucket 4 -> 4 + 2
        assert out6["depth"].shape == (6, H, W)
        out_last = session.predict(images[5:6], cams[5:6])
        np.testing.assert_allclose(
            out6["idepth"][5], out_last["idepth"][0], atol=1e-4
        )

    def test_wire_format_equivalence(self, session, frames):
        from cnmnet_tpu.data.pipeline import normalize_images

        images_u8, cams = frames
        f32 = normalize_images(images_u8.astype(np.float32) / 255.0)
        a = session.predict(images_u8[:1], cams[:1])
        b = session.predict(f32[:1], cams[:1])
        np.testing.assert_allclose(a["idepth"], b["idepth"], atol=5e-4)


class TestMixedViewCounts:
    def test_two_view_first_then_three_view(self, frames):
        """A session whose FIRST request is 2-view must still serve a later
        3-view request: variable init uses a >=3-view dummy regardless, so
        RefineNet params exist (round-3 ADVICE fix — a 2-view init returned
        before RefineNet and a later V>=3 predict crashed on missing
        params)."""
        images, cams = frames
        session = InferenceSession(_cfg(), batch_buckets=(1,))
        out2 = session.predict(images[:1, :2], cams[:1, :2])
        assert "prob" not in out2  # 2-view path has no occlusion head
        out3 = session.predict(images[:1], cams[:1])
        assert out3["idepth"].shape == (1, H, W)
        assert "prob" in out3

    def test_session_does_not_mutate_caller_config(self):
        cfg = _cfg()
        before = cfg.model.compute_dtype
        InferenceSession(cfg, batch_buckets=(1,))
        assert cfg.model.compute_dtype == before


class TestMicroBatcher:
    def test_coalesces_and_preserves_order(self, session, frames):
        images, cams = frames
        mb = MicroBatcher(session, max_batch=4, max_wait_ms=50)
        try:
            futs = [mb.submit(images[i], cams[i]) for i in range(6)]
            results = [f.result(timeout=120) for f in futs]
        finally:
            mb.close()
        for i, r in enumerate(results):
            want = session.predict(images[i : i + 1], cams[i : i + 1])
            np.testing.assert_allclose(r["idepth"], want["idepth"][0], atol=1e-4)

    def test_error_propagates_without_killing_batcher(self, session, frames):
        images, cams = frames
        mb = MicroBatcher(session, max_batch=2, max_wait_ms=5)
        try:
            bad = mb.submit(np.zeros((2, 2)), np.zeros((2, 2)))  # wrong rank
            with pytest.raises(Exception):
                bad.result(timeout=60)
            good = mb.submit(images[0], cams[0])
            out = good.result(timeout=120)
            assert out["depth"].shape == (H, W)
        finally:
            mb.close()


class TestInferCLI:
    def test_infer_over_npz_dir(self, tmp_path, frames):
        from cnmnet_tpu.cli import main

        images, cams = frames
        for i in range(3):
            np.savez(tmp_path / f"frame{i}.npz", images=images[i], cams=cams[i])
        out_dir = tmp_path / "out"
        rc = main(
            [
                "infer",
                "--inputs", str(tmp_path / "*.npz"),
                "--out-dir", str(out_dir),
                "--batch", "2",
                "model.num_planes=8", "model.k_size=5",
            ]
        )
        assert rc == 0
        preds = sorted(glob.glob(str(out_dir / "*.pred.npz")))
        assert len(preds) == 3
        with np.load(preds[0]) as z:
            assert z["depth"].shape == (H, W)
            assert z["normal"].shape == (H, W, 3)
            assert np.isfinite(z["depth"]).all()
