"""Experiment logging: JSONL event stream + PNG image dumps.

Replaces the reference's TF1 ``tf.summary`` Logger (`logger.py:11-73`) and
sacred FileStorageObserver with dependency-light equivalents:

* scalars -> ``events.jsonl`` (one JSON object per log call: step, wall
  time, values) — machine-readable, greppable, TB-convertible;
* images -> PNG files under ``images/<tag>/<step>.png`` (via PIL);
* histograms -> summary stats (min/max/mean/percentiles) in the JSONL;
* run config snapshot -> ``config.json`` (the sacred-observer role).

Process-0 gating for multi-host runs is built in.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

try:
    import jax

    def _is_main_process() -> bool:
        return jax.process_index() == 0

except Exception:  # pragma: no cover

    def _is_main_process() -> bool:
        return True


class MetricLogger:
    def __init__(self, log_dir: str, config: Optional[dict] = None, echo=print):
        self.log_dir = log_dir
        self.enabled = _is_main_process()
        self.echo = echo
        if not self.enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._events_path = os.path.join(log_dir, "events.jsonl")
        self._events = open(self._events_path, "a", buffering=1)
        if config is not None:
            with open(os.path.join(log_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log_scalars(self, step: int, values: Dict[str, float], prefix: str = ""):
        if not self.enabled:
            return
        record = {"step": step, "time": time.time(), "type": "scalars"}
        record.update({k: float(v) for k, v in values.items()})
        self._events.write(json.dumps(record) + "\n")
        if self.echo:
            pretty = " ".join(
                f"{k}: {v:.4f}" for k, v in values.items() if isinstance(v, float)
            )
            self.echo(f"[{prefix}][{step}] {pretty}")

    def log_histogram(self, step: int, tag: str, values: np.ndarray):
        if not self.enabled:
            return
        v = np.asarray(values).ravel()
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        record = {
            "step": step,
            "time": time.time(),
            "type": "histogram",
            "tag": tag,
            "min": float(v.min()),
            "max": float(v.max()),
            "mean": float(v.mean()),
            "std": float(v.std()),
            "p5": float(np.percentile(v, 5)),
            "p50": float(np.percentile(v, 50)),
            "p95": float(np.percentile(v, 95)),
        }
        self._events.write(json.dumps(record) + "\n")

    def log_image(self, step: int, tag: str, image: np.ndarray):
        """image: [H, W, 3] uint8 (or float in [0, 1])."""
        if not self.enabled:
            return
        from PIL import Image

        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        d = os.path.join(self.log_dir, "images", tag)
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(os.path.join(d, f"{step:08d}.png"))

    def close(self):
        if self.enabled:
            self._events.close()
