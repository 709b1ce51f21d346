"""HTML gallery writer over the eval artifact layout."""

import os

import numpy as np
import pytest

from cnmnet_tpu.evals.html_report import write_comparison, write_report


def _mock_run(root, frames=("frame-000000", "frame-000010"), kinds=None):
    from PIL import Image

    kinds = kinds or ("rgb", "gt_depth", "pred_depth", "pred_normal", "prob_map")
    seq = os.path.join(root, "chess", "seq-01")
    for kind in kinds:
        d = os.path.join(seq, kind)
        os.makedirs(d, exist_ok=True)
        for name in frames:
            img = Image.fromarray(np.zeros((4, 6, 3), np.uint8))
            img.save(os.path.join(d, f"{name}.{kind}.png"))
    return seq


class TestWriteReport:
    def test_pages_and_index(self, tmp_path):
        run = str(tmp_path)
        seq = _mock_run(run)
        pages = write_report(run)
        assert pages == [os.path.join(seq, "index.html")]
        page = open(pages[0]).read()
        # one row per frame, one img per kind
        assert page.count("<tr>") == 3  # header + 2 frames
        assert page.count("<img") == 10
        assert "pred_depth/frame-000000.pred_depth.png" in page
        index = open(os.path.join(run, "index.html")).read()
        assert "chess/seq-01/index.html" in index

    def test_missing_kind_renders_dash(self, tmp_path):
        run = str(tmp_path)
        _mock_run(run, kinds=("rgb", "pred_depth"))
        # one frame lacks its pred_depth png
        os.remove(
            os.path.join(
                run, "chess", "seq-01", "pred_depth",
                "frame-000010.pred_depth.png",
            )
        )
        (page,) = write_report(run)
        txt = open(page).read()
        assert txt.count("<img") == 3
        assert "—" in txt


class TestCLI:
    def test_report_and_export_tb_commands(self, tmp_path):
        """The documented `cli report` / `cli export-tb` entry points over
        the same artifact layouts the module tests use."""
        from cnmnet_tpu.cli import main
        from cnmnet_tpu.obs.logger import MetricLogger

        run = str(tmp_path / "run")
        _mock_run(run)
        assert main(["report", run]) == 0
        assert os.path.exists(os.path.join(run, "index.html"))

        log_dir = str(tmp_path / "logs")
        log = MetricLogger(log_dir, config={}, echo=None)
        log.log_scalars(1, {"loss": 2.0})
        log.close()
        assert main(["export-tb", log_dir]) == 0
        tb = [f for f in os.listdir(log_dir) if "tfevents" in f]
        assert tb, os.listdir(log_dir)


class TestWriteComparison:
    def test_side_by_side(self, tmp_path):
        a, b = str(tmp_path / "runA"), str(tmp_path / "runB")
        _mock_run(a)
        _mock_run(b)
        out = str(tmp_path / "cmp.html")
        write_comparison(out, [a, b], labels=["base", "tuned"])
        txt = open(out).read()
        assert "base" in txt and "tuned" in txt
        # 2 common + 2 runs x 2 kinds = 6 images per frame, 2 frames
        assert txt.count("<img") == 12
        assert "runA/chess/seq-01/pred_depth/frame-000000.pred_depth.png" in txt
        assert "runB/chess/seq-01/pred_normal/frame-000010.pred_normal.png" in txt
