"""7-Scenes cross-dataset evaluation harness.

Implements every protocol of the reference's `eval.py` as one parameterized
driver (`num_sources` replaces the four near-duplicate sacred commands):

* 2-view  (`eval`,   `eval.py:162-319`): index % 10, source +10, no refiner;
* 3-view  (`eval_refine`, `:321-520`): index % 3, sources +/-10, refined;
* 5-view  (`eval_refine_five_views`, `:523-712`): index % 3, sources
  +10,-10,+5,-5 batched through one DepthNet call, pair-averaged into the
  refiner;
* 7-view  (`eval_refine_seven_views`, `:715-993`): index % 9, +/-10, +/-5,
  +/-20.

Offsets are ordered so the model's even/odd grouping reproduces the
reference's pair averaging. Metrics follow `cal_metrics`
(`eval.py:995-1090`): predictions resized to the native GT resolution,
clamped to [0.3, 8.0] m, GT masked to the same range, nine metrics averaged
per frame then over frames.

The whole per-frame compute (cost volumes + DepthNet + RefineNet +
depth->normal) is one jitted function reused across frames; host work is
file IO only.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np

from cnmnet_tpu.data.seven_scenes import SevenScenes

EVAL_PROTOCOLS = {
    # num_sources: source offsets in reference order plus the reference's
    # EXACT loop structure — `for index in range(start, len - end_margin):
    # if index % modulus != 0: continue` (`eval.py:239-240, 408-409,
    # 581-582, 817-818`): the frame census is part of metric parity.
    # Quirks preserved deliberately: the 5-view command reuses the 7-view's
    # end margin (len-20 although its max forward offset is 10), and the
    # 7-view's start of 10 < its max backward offset 20, so index 18 reads
    # filepaths[index-20] < 0 — Python wraps that to the sequence END, and
    # so do we (list indexing).
    1: dict(modulus=10, offsets=(10,), start=0, end_margin=10),
    2: dict(modulus=3, offsets=(10, -10), start=10, end_margin=10),
    4: dict(modulus=3, offsets=(10, -10, 5, -5), start=10, end_margin=20),
    6: dict(modulus=9, offsets=(10, -10, 5, -5, 20, -20), start=10, end_margin=20),
}


def protocol_frame_indices(num_sources: int, num_frames: int) -> List[int]:
    """Reference-frame indices a protocol visits in a sequence of
    ``num_frames`` frames — the exact census of the reference loops
    (`eval.py:239-240,408-409,581-582,817-818`)."""
    proto = EVAL_PROTOCOLS[num_sources]
    return [
        i
        for i in range(proto["start"], num_frames - proto["end_margin"])
        if i % proto["modulus"] == 0
    ]


def aggregate_metrics(per_frame: List[Dict[str, float]]) -> Dict[str, float]:
    """Mean of each metric over frames (reference averages per-frame values)."""
    if not per_frame:
        return {}
    keys = per_frame[0].keys()
    return {k: float(np.mean([f[k] for f in per_frame])) for k in keys}


def _frame_metrics(pred_depth: np.ndarray, gt_depth: np.ndarray,
                   min_depth=0.3, max_depth=8.0) -> Dict[str, float]:
    """cal_metrics parity for one frame: resize pred to GT, clamp, mask."""
    from cnmnet_tpu.evals.cal_metrics import frame_metrics

    return frame_metrics(pred_depth, gt_depth, min_depth=min_depth,
                         max_depth=max_depth)


def _save_frame_artifacts(save_dir, p, idepth, prob_map, normal):
    """Per-frame artifact dumps, layout + content parity with the
    reference (`eval.py:394-404,461-510`): five directories per sequence,
    each frame saved as raw npy plus a colorized png."""
    from PIL import Image

    from cnmnet_tpu.data.pipeline import denormalize_images
    from cnmnet_tpu.obs.colorize import (
        colorize_depth,
        colorize_prob,
        normal_to_color,
    )

    base = os.path.join(save_dir, p["scene"], p["seq"])
    dirs = {}
    for kind in ("rgb", "gt_depth", "pred_depth", "pred_normal", "prob_map"):
        dirs[kind] = os.path.join(base, kind)
        os.makedirs(dirs[kind], exist_ok=True)
    name = p["name"]

    def save_png(kind, suffix, img_uint8):
        Image.fromarray(img_uint8).save(
            os.path.join(dirs[kind], f"{name}.{suffix}.png")
        )

    def save_npy(kind, suffix, arr):
        np.save(os.path.join(dirs[kind], f"{name}.{suffix}.npy"), arr)

    rgb = denormalize_images(p["images"][0])
    save_png("rgb", "color", (np.clip(rgb, 0, 1) * 255).astype(np.uint8))

    save_npy("gt_depth", "gt_depth", p["gt_depth"])
    save_png("gt_depth", "gt_depth", colorize_depth(p["gt_depth"]))

    # the reference's artifact conversion (`eval.py:490-492`):
    # depth = 1/(idepth + 1e-4), > 100 m zeroed
    pred_depth = np.reciprocal(idepth + 1e-4)
    pred_depth = np.where(pred_depth > 100.0, 0.0, pred_depth)
    save_npy("pred_depth", "pred_depth", pred_depth)
    save_png("pred_depth", "pred_depth", colorize_depth(pred_depth))

    if normal is not None:
        save_npy("pred_normal", "pred_normal", normal)
        save_png("pred_normal", "pred_normal", normal_to_color(normal))
    if prob_map is not None:
        save_npy("prob_map", "prob_map", prob_map)
        save_png("prob_map", "prob_map", colorize_prob(prob_map))


def evaluate_seven_scenes(
    forward_fn,
    root_dir: str,
    num_sources: int = 2,
    image_height: int = 192,
    image_width: int = 256,
    save_dir: Optional[str] = None,
    max_frames_per_seq: Optional[int] = None,
    seqs: Optional[list] = None,
    logger=None,
    frame_batch: int = 1,
    mesh=None,
    wire_dtype: str = "float32",
) -> Dict[str, float]:
    """Run a protocol over the 18 test sequences.

    Args:
      forward_fn: jitted ``(images [1, V, h, w, 3], cams [1, V, 2, 4, 4]) ->
        idepth [1, h, w, 1]`` — refined when V > 2, single-pair disp1 when
        V == 2 (build with ``make_eval_forward``).
      root_dir: 7-Scenes root.

    Returns:
      dict of the nine aggregate metrics + timing (mean seconds/frame).
    """
    proto = EVAL_PROTOCOLS[num_sources]
    if mesh is not None and mesh.shape.get("tile", 1) > 1:
        from cnmnet_tpu.parallel.sharding import tile_partition_safe

        safe, reason = tile_partition_safe(
            image_height, mesh.shape["tile"]
        )
        if not safe:
            import warnings

            warnings.warn(
                f"tile-sharded eval at this height risks GSPMD's silent "
                f"halo miscompile: {reason}", stacklevel=2,
            )
    ds = SevenScenes(root_dir, image_height, image_width, wire_dtype=wire_dtype)
    per_frame: List[Dict[str, float]] = []
    total_time, count = 0.0, 0
    import jax

    # pending frames for batched (data-parallel) inference
    pending: List[dict] = []

    def flush():
        """Run one batched forward over the pending frames (padding the tail
        so a single compiled program serves every flush)."""
        nonlocal total_time, count
        if not pending:
            return
        n = len(pending)
        images = np.stack([p["images"] for p in pending])
        cams = np.stack([p["cams"] for p in pending])
        if n < frame_batch:  # pad to the fixed batch shape
            reps = frame_batch - n
            images = np.concatenate([images, np.repeat(images[-1:], reps, 0)])
            cams = np.concatenate([cams, np.repeat(cams[-1:], reps, 0)])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # images [B, V, h, w, 3]: frames over "data", rows over "tile"
            # (spatial partitioning for native-res eval; GSPMD inserts the
            # halo exchanges through the conv stack). cams replicate over
            # "tile".
            tiled = mesh.shape.get("tile", 1) > 1
            img_spec = P("data", None, "tile") if tiled else P("data")
            images = jax.device_put(images, NamedSharding(mesh, img_spec))
            cams = jax.device_put(cams, NamedSharding(mesh, P("data")))
        t0 = time.monotonic()
        out = jax.block_until_ready(forward_fn(images, cams))
        total_time += time.monotonic() - t0
        count += n
        idepth, prob_map, normal = (np.asarray(o) if o is not None else None
                                    for o in out)
        for i, p in enumerate(pending):
            pred_depth = 1.0 / (idepth[i, :, :, 0] + 1e-8)
            per_frame.append(_frame_metrics(pred_depth, p["gt_depth"]))
            if save_dir:
                _save_frame_artifacts(
                    save_dir, p, idepth[i, :, :, 0],
                    prob_map[i, :, :, 0] if prob_map is not None else None,
                    normal[i] if normal is not None else None,
                )
        pending.clear()

    for scene, seq in (seqs or ds.test_seqs_list):
        paths = ds.frame_paths(scene, seq)
        done = 0
        for index in protocol_frame_indices(num_sources, len(paths)):
            if max_frames_per_seq and done >= max_frames_per_seq:
                break
            try:
                ref_rgb, gt_depth, ref_cam = ds.load_frame(paths[index])
                views = [(ref_rgb, ref_cam)]
                for off in proto["offsets"]:
                    rgb, _, cam = ds.load_frame(
                        paths[index + off], with_depth=False
                    )
                    views.append((rgb, cam))
            except (ValueError, FileNotFoundError, OSError):
                continue  # invalid cameras are skipped (`eval.py:594-617`)

            pending.append(
                {
                    "images": np.stack([v[0] for v in views]),
                    "cams": np.stack([v[1] for v in views]),
                    "gt_depth": gt_depth,
                    "scene": scene,
                    "seq": seq,
                    "name": paths[index]["name"],
                }
            )
            done += 1
            if len(pending) >= frame_batch:
                flush()
        flush()
        if logger is not None and count:
            logger.log_scalars(
                count, aggregate_metrics(per_frame), prefix=f"{scene}/{seq}"
            )

    result = aggregate_metrics(per_frame)
    result["seconds_per_frame"] = total_time / max(count, 1)
    result["frames"] = float(count)
    return result


def make_eval_forward(model, variables, k_size: int = 9):
    """Build the jitted eval forward for any view count.

    Returns ``fn(images, cams) -> (idepth [B, h, w, 1], prob_map | None,
    normal [B, h, w, 3])`` — idepth is the refined map when V > 2, the
    single-pair disp1 when V == 2; normals follow the reference's eval-time
    ``depth2normal(1/idepth, K^-1)`` (`eval.py:449-455`).
    """
    import jax
    import jax.numpy as jnp

    from cnmnet_tpu.geometry.camera import invert_intrinsics
    from cnmnet_tpu.kernels import dispatch
    from cnmnet_tpu.ops.images import prepare_images

    @jax.jit
    def fn(images, cams):
        out = model.apply(
            variables,
            prepare_images(jnp.asarray(images)),
            jnp.asarray(cams),
            train=False,
        )
        if out.idepth_refined is not None:
            idepth, prob = out.idepth_refined, out.prob_map
        else:
            idepth, prob = out.disps[0][:, 0], None
        depth = 1.0 / (idepth[..., 0] + 1e-8)
        K_inv = invert_intrinsics(cams[:, 0, 1, :3, :3])
        normal, _ = dispatch.depth_to_normal(depth, K_inv, k_size)
        return idepth, prob, normal

    return fn
