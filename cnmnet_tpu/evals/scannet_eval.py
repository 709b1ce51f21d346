"""ScanNet test-set evaluation.

The reference evaluates ScanNet through the same networks with its
`test.txt` list (16 held-out samples; `configs/config.yaml:6` keeps a
`scannet_test_eva_dir` slot). Here: run the multi-view forward over a
ScanNet-format dataset (or any object yielding its sample dict) and
aggregate the nine depth metrics under the eval clamp ([0.3, 8.0] m,
`eval.py:1009-1037`).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from cnmnet_tpu.ops import metrics as M


def evaluate_scannet(
    forward_fn,
    dataset,
    max_samples: Optional[int] = None,
    min_depth: float = 0.3,
    max_depth: float = 8.0,
    logger=None,
) -> Dict[str, float]:
    """forward_fn: (images [1, V, h, w, 3], cams [1, V, 2, 4, 4]) -> idepth
    [1, h, w, 1]. dataset: indexable yielding the ScanNet sample dict."""
    import jax

    per_frame: List[Dict[str, float]] = []
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for i in range(n):
        sample = dataset[i]
        images = np.asarray(sample["images"])[None]
        cams = np.asarray(sample["cams"])[None]
        out = jax.block_until_ready(forward_fn(images, cams))
        # accept both the bare-idepth and the (idepth, prob, normal)
        # contract of make_eval_forward
        idepth = out[0] if isinstance(out, tuple) else out
        pred_depth = 1.0 / (np.asarray(idepth)[0, :, :, 0] + 1e-8)
        gt_depth = np.asarray(sample["depths"][0])

        pred = np.clip(pred_depth, min_depth, max_depth)
        mask = M.compute_valid_depth_mask(
            gt_depth, min_thred=min_depth, max_thred=max_depth
        )
        if mask.sum() == 0:
            continue
        per_frame.append(M.compute_errors(pred[mask], gt_depth[mask]))
        if logger is not None and (i + 1) % 10 == 0:
            logger.log_scalars(i + 1, per_frame[-1], prefix="scannet_eval")

    if not per_frame:
        return {}
    keys = per_frame[0].keys()
    out = {k: float(np.mean([f[k] for f in per_frame])) for k in keys}
    out["frames"] = float(len(per_frame))
    return out
