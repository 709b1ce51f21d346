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


class TestOutputWire:
    """The packed output wire (round 5): predict fetches ONE [B, H, W, C]
    array of only the SELECTED outputs in the session's wire dtype —
    measured fetch-bound through this host's tunnel (docs/SERVING.md)."""

    def test_output_selection_matches_full(self, session, frames):
        images, cams = frames
        full = session.predict(images[:1], cams[:1])
        sel = InferenceSession(
            _cfg(), batch_buckets=(1,), outputs=("depth", "prob")
        )
        out = sel.predict(images[:1], cams[:1])
        assert set(out) == {"depth", "prob"}
        np.testing.assert_allclose(out["depth"], full["depth"], atol=1e-5)
        np.testing.assert_allclose(out["prob"], full["prob"], atol=1e-5)

    def test_f16_wire_quantization_bounded(self, session, frames):
        images, cams = frames
        full = session.predict(images[:1], cams[:1])
        f16 = InferenceSession(_cfg(), batch_buckets=(1,), wire_dtype="float16")
        out = f16.predict(images[:1], cams[:1])
        assert out["depth"].dtype == np.float32  # contract: f32 results
        assert np.isfinite(out["depth"]).all()  # saturates, never inf
        # f16 wire: ~2^-11 relative quantization plus saturation at the
        # f16 max (the untrained net's raw 1/idepth can exceed 65504)
        f16_max = float(np.finfo(np.float16).max)
        np.testing.assert_allclose(
            out["depth"], np.minimum(full["depth"], f16_max),
            rtol=2e-3, atol=1e-3,
        )
        np.testing.assert_allclose(
            out["normal"], full["normal"], rtol=2e-3, atol=2e-3
        )

    def test_prob_selection_on_two_view_path(self, frames):
        # "prob" selected but the 2-view path has no occlusion head: the
        # key must simply be absent, not crash
        images, cams = frames
        sel = InferenceSession(
            _cfg(), batch_buckets=(1,), outputs=("idepth", "prob")
        )
        out = sel.predict(images[:1, :2], cams[:1, :2])
        assert set(out) == {"idepth"}

    def test_rejects_unknown_output_and_dtype(self):
        with pytest.raises(ValueError, match="unknown outputs"):
            InferenceSession(_cfg(), outputs=("depth", "confidence"))
        with pytest.raises(ValueError, match="wire_dtype"):
            InferenceSession(_cfg(), wire_dtype="int8")

    def test_predict_async_fetch_matches_predict(self, session, frames):
        # the double-buffering primitive: dispatch now, transfer later —
        # must be value-identical to the blocking path
        images, cams = frames
        want = session.predict(images[:2], cams[:2])
        handle = session.predict_async(images[:2], cams[:2])
        out = session.fetch(handle)
        assert set(out) == set(want)
        for k in want:
            np.testing.assert_array_equal(out[k], want[k])
        with pytest.raises(ValueError, match="top bucket"):
            session.predict_async(images[:6], cams[:6])  # 6 > top bucket 4


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

    def test_double_buffered_loop_under_concurrent_submitters(
        self, session, frames
    ):
        """The round-5 double-buffered loop (dispatch N+1 before fetching
        N) must keep every future mapped to ITS request under racing
        submitters — 20 requests from 4 threads, identity checked via the
        per-request input images."""
        import threading

        images, cams = frames
        mb = MicroBatcher(session, max_batch=4, max_wait_ms=10)
        results = {}
        lock = threading.Lock()

        def client(ids):
            for i in ids:
                out = mb.submit(images[i % 6], cams[i % 6]).result(timeout=300)
                with lock:
                    results[i] = out
        try:
            threads = [
                threading.Thread(target=client, args=(range(t, 20, 4),))
                for t in range(4)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
        finally:
            mb.close()
        assert len(results) == 20
        want = [
            session.predict(images[j : j + 1], cams[j : j + 1]) for j in range(6)
        ]
        for i, out in results.items():
            np.testing.assert_allclose(
                out["idepth"], want[i % 6]["idepth"][0], atol=1e-4
            )

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
