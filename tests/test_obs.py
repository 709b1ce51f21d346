"""Observability layer tests: JSONL logger, colorizers, timers."""

import json
import os

import numpy as np
import pytest

from cnmnet_tpu.obs import (
    AverageMeter,
    MetricLogger,
    StepTimer,
    colorize_depth,
    colorize_idepth,
    colorize_prob,
    normal_to_color,
)


class TestMetricLogger:
    def test_scalars_jsonl(self, tmp_path):
        lines = []
        logger = MetricLogger(str(tmp_path), config={"a": 1}, echo=lines.append)
        logger.log_scalars(5, {"loss": 1.5, "lr": 1e-4}, prefix="ep0")
        logger.log_scalars(10, {"loss": 1.2})
        logger.close()

        events = [
            json.loads(l)
            for l in (tmp_path / "events.jsonl").read_text().splitlines()
        ]
        assert len(events) == 2
        assert events[0]["step"] == 5 and events[0]["loss"] == 1.5
        assert events[1]["loss"] == 1.2
        cfg = json.loads((tmp_path / "config.json").read_text())
        assert cfg == {"a": 1}
        assert "ep0" in lines[0]

    def test_histogram_stats(self, tmp_path):
        logger = MetricLogger(str(tmp_path), echo=None)
        vals = np.concatenate([np.arange(100.0), [np.nan]])
        logger.log_histogram(1, "probs", vals)
        logger.close()
        ev = json.loads((tmp_path / "events.jsonl").read_text())
        assert ev["type"] == "histogram"
        assert ev["min"] == 0.0 and ev["max"] == 99.0
        assert 48 < ev["p50"] < 51

    def test_image_png(self, tmp_path):
        logger = MetricLogger(str(tmp_path), echo=None)
        img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
        logger.log_image(3, "rgb", img)
        files = list((tmp_path / "images" / "rgb").glob("*.png"))
        assert len(files) == 1
        from PIL import Image

        loaded = np.asarray(Image.open(files[0]))
        assert loaded.shape == (8, 8, 3)


class TestColorizers:
    def test_depth_range_and_invalid(self):
        depth = np.asarray([[0.1, 1.0], [4.0, 9.0]])  # 0.1 and 9.0 out of range
        out = colorize_depth(depth, 0.3, 8.0)
        assert out.shape == (2, 2, 3) and out.dtype == np.uint8

    def test_idepth_prob_normal(self):
        assert colorize_idepth(np.full((4, 4), 1.0)).shape == (4, 4, 3)
        assert colorize_prob(np.full((4, 4), 0.5)).shape == (4, 4, 3)
        n = np.zeros((4, 4, 3))
        n[..., 2] = 1.0
        c = normal_to_color(n)
        np.testing.assert_array_equal(c[0, 0], [127, 127, 255])


class TestMeters:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(2.0)
        m.update(4.0, n=3)
        assert m.avg == pytest.approx((2 + 12) / 4)
        m.reset()
        assert m.count == 0

    def test_step_timer(self):
        import jax.numpy as jnp

        t = StepTimer()
        out = t.timed(lambda x: x * 2, jnp.ones((4,)))
        assert t.mean > 0
        np.testing.assert_array_equal(np.asarray(out), 2.0)
