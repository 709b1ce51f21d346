"""TensorBoard wire-format exporter round-trip tests (no TF needed)."""

import json
import os
import struct

import numpy as np
import pytest

from cnmnet_tpu.obs.logger import MetricLogger
from cnmnet_tpu.obs.tb_export import (
    convert_run,
    crc32c,
    parse_proto,
    read_records,
)


def test_crc32c_check_value():
    # The Castagnoli check value (iSCSI / RFC 3720 test vector).
    assert crc32c(b"123456789") == 0xE3069283


def _events(path):
    return [parse_proto(r) for r in read_records(path)]


class TestConvertRun:
    @pytest.fixture()
    def run_dir(self, tmp_path):
        log = MetricLogger(str(tmp_path), config={"lr": 1e-4}, echo=None)
        log.log_scalars(1, {"loss": 2.5, "abs_rel": 0.25})
        log.log_scalars(2, {"loss": 1.25})
        log.log_histogram(2, "grads", np.linspace(-1.0, 3.0, 101))
        log.log_image(3, "depth", np.zeros((4, 6, 3), np.uint8))
        log.close()
        return str(tmp_path)

    def test_round_trip(self, run_dir):
        path = convert_run(run_dir)
        events = _events(path)
        # record 0: file_version
        assert events[0][3] == [b"brain.Event:2"]

        # scalar events: Event.summary (field 5) -> Summary.value (field 1)
        summaries = [parse_proto(e[5][0]) for e in events[1:] if 5 in e]
        values = [parse_proto(v) for s in summaries for v in s[1]]
        tags = {v[1][0].decode(): v for v in values}
        assert {"loss", "abs_rel", "grads", "depth"} <= set(tags)

        # simple_value of the step-2 loss
        losses = [
            parse_proto(parse_proto(e[5][0])[1][0])
            for e in events[1:]
            if 5 in e and b"loss" in e[5][0]
        ]
        vals = sorted(v[2][0] for v in losses if 2 in v)
        assert vals == pytest.approx([1.25, 2.5])

        # step numbers survive (field 2 varint)
        steps = sorted(e[2][0] for e in events[1:])
        assert steps == [1, 2, 2, 3]

    def test_histogram_fields(self, run_dir):
        path = convert_run(run_dir)
        for e in _events(path):
            if 5 not in e or b"grads" not in e[5][0]:
                continue
            value = parse_proto(parse_proto(e[5][0])[1][0])
            histo = parse_proto(value[5][0])
            assert histo[1][0] == pytest.approx(-1.0)  # min
            assert histo[2][0] == pytest.approx(3.0)  # max
            limits = np.frombuffer(histo[6][0], "<f8")
            counts = np.frombuffer(histo[7][0], "<f8")
            assert limits.shape == counts.shape == (4,)
            assert np.all(np.diff(limits) > 0)  # strictly increasing edges
            assert counts.sum() == pytest.approx(100.0)
            # moments encode the recorded variance: linspace(-1, 3, 101)
            # has mean 1 and var (Sum (x-1)^2)/101
            x = np.linspace(-1.0, 3.0, 101)
            assert histo[4][0] == pytest.approx(x.mean() * 100.0)
            assert histo[5][0] == pytest.approx(
                (x.var() + x.mean() ** 2) * 100.0, rel=1e-6
            )
            return
        raise AssertionError("no histogram event found")

    def test_degenerate_histogram_edges_strictly_increase(self, tmp_path):
        """Constant values give p5 == p50 == p95 == max; the written bucket
        edges must still be strictly increasing for TB to render."""
        log = MetricLogger(str(tmp_path), echo=None)
        log.log_histogram(1, "const", np.full(64, 2.0))
        log.close()
        path = convert_run(str(tmp_path))
        for e in _events(path):
            if 5 not in e or b"const" not in e[5][0]:
                continue
            value = parse_proto(parse_proto(e[5][0])[1][0])
            histo = parse_proto(value[5][0])
            limits = np.frombuffer(histo[6][0], "<f8")
            assert np.all(np.diff(limits) > 0)
            assert histo[5][0] == pytest.approx(4.0 * 100.0)  # var=0, mean=2
            return
        raise AssertionError("no histogram event found")

    def test_image_embedded_verbatim(self, run_dir):
        path = convert_run(run_dir)
        for e in _events(path):
            if 5 not in e or b"depth" not in e[5][0]:
                continue
            value = parse_proto(parse_proto(e[5][0])[1][0])
            img = parse_proto(value[4][0])
            assert img[1][0] == 4 and img[2][0] == 6  # height, width
            png = img[4][0]
            with open(
                os.path.join(run_dir, "images", "depth", "00000003.png"), "rb"
            ) as f:
                assert png == f.read()
            return
        raise AssertionError("no image event found")

    def test_crc_detects_corruption(self, run_dir, tmp_path):
        path = convert_run(run_dir)
        blob = bytearray(open(path, "rb").read())
        blob[-3] ^= 0xFF  # flip a byte inside the last record's payload
        bad = tmp_path / "corrupt.tfevents"
        bad.write_bytes(bytes(blob))
        with pytest.raises(ValueError, match="crc"):
            list(read_records(str(bad)))
