"""Inference serving: checkpointed sessions + request micro-batching.

The reference has no serving story (its `eval.py` loops one frame at a
time); this module is the deployment counterpart the brief's "production
serving" goal asks for, built around two TPU facts measured in RESULTS.md:

* batch-1 latency is dispatch-bound (~7.5 ms/frame) while the device is
  compute-bound from batch 4 up (~5.4 ms/frame, 187 frames/s at batch 16)
  — so online serving wants *micro-batching*;
* every distinct (batch, views, H, W) signature is a separate XLA program
  (15-20 min cold compiles on this machine) — so batch sizes must be
  bucketed to a small fixed set and padded, never compiled per request.

`InferenceSession` owns the model + checkpoint and the jitted forwards
(one per bucket, compiled lazily, persistent-cached); `MicroBatcher` is a
thread-safe request queue that coalesces concurrent `submit()`s into
bucket-sized batches. Inputs ride either wire format (uint8 raw RGB or
host-normalized float32 — `ops/images.prepare_images` dispatches by dtype).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, Optional, Sequence

import numpy as np

from cnmnet_tpu.config import Config


def _next_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class InferenceSession:
    """Checkpoint-backed batched inference.

    predict(images [B, V, H, W, 3] (uint8 or f32), cams [B, V, 2, 4, 4])
      -> dict of numpy arrays: idepth [B, H, W], depth [B, H, W],
         prob [B, H, W] (refined path only), normal [B, H, W, 3].

    Batches are padded up to the next bucket (replicating the last frame —
    cheaper than a guard compile) and cropped back; results are unaffected
    (inference is per-sample; BN runs in eval mode on running stats).
    """

    def __init__(
        self,
        cfg: Optional[Config] = None,
        checkpoint: Optional[str] = None,
        batch_buckets: Sequence[int] = (1, 4, 8),
        k_size: Optional[int] = None,
        mesh=None,
    ):
        import copy

        import jax

        from cnmnet_tpu.cache import enable_compilation_cache

        enable_compilation_cache()
        # session-local copy: the bf16 override below must not leak into a
        # caller's Config shared with e.g. a training run
        self.cfg = copy.deepcopy(cfg) if cfg is not None else Config()
        if jax.devices()[0].platform != "cpu" and (
            self.cfg.model.compute_dtype == "float32"
        ):
            # serving default on accelerators: bf16 compute (bench parity)
            self.cfg.model.compute_dtype = "bfloat16"
        self.buckets = tuple(sorted(set(int(b) for b in batch_buckets)))
        # Multi-chip serving: a ("data"[, "tile"]) jax.sharding.Mesh shards
        # each bucket batch over "data" (params replicated — the eval-mesh
        # wiring, `cli.py cmd_eval`) and image rows over "tile" when
        # present. Buckets are rounded UP to multiples of the data axis so
        # every device takes an even share of every compiled program.
        self.mesh = mesh
        if mesh is not None:
            data = int(mesh.shape.get("data", 1))
            if data > 1:
                self.buckets = tuple(sorted(
                    {((b + data - 1) // data) * data for b in self.buckets}
                ))
        self.k_size = k_size or self.cfg.model.k_size
        self._forwards: Dict[tuple, object] = {}
        self._variables = None
        self._checkpoint = checkpoint
        self._lock = threading.Lock()

    # -- internals --------------------------------------------------------

    def _ensure_variables(self, images: np.ndarray, cams: np.ndarray):
        if self._variables is not None:
            return
        import jax

        from cnmnet_tpu.ops.images import prepare_images
        from cnmnet_tpu.train.state import build_model, create_train_state

        model = build_model(self.cfg)
        # init with >= 3 views regardless of the first request's V: a
        # 2-view init would return before RefineNet and create no refiner
        # params, crashing a later V>=3 predict on the same session
        img1, cam1 = images[:1], cams[:1]
        if img1.shape[1] < 3:
            reps = 3 - img1.shape[1]
            img1 = np.concatenate([img1] + [img1[:, -1:]] * reps, axis=1)
            cam1 = np.concatenate([cam1] + [cam1[:, -1:]] * reps, axis=1)
        batch = {"images": img1, "cams": cam1}
        state = create_train_state(self.cfg, jax.random.PRNGKey(0), batch)
        if self._checkpoint:
            from cnmnet_tpu.train.checkpoint import CheckpointManager

            mgr = CheckpointManager(self.cfg.train.checkpoint_dir or ".")
            restored = mgr.restore(self._checkpoint, state)
            if restored is None:
                raise FileNotFoundError(self._checkpoint)
            state = restored
        self._model = model
        self._prepare = prepare_images
        self._variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._variables = jax.device_put(
                self._variables, NamedSharding(self.mesh, P())
            )

    def _place(self, images, cams):
        """Device placement for one bucket batch: shard frames over "data"
        (and rows over "tile") when serving on a mesh."""
        import jax
        import jax.numpy as jnp

        if self.mesh is None:
            return jnp.asarray(images), jnp.asarray(cams)
        from jax.sharding import NamedSharding, PartitionSpec as P

        tile = int(self.mesh.shape.get("tile", 1))
        if tile > 1:
            from cnmnet_tpu.parallel.sharding import tile_partition_safe

            safe, reason = tile_partition_safe(images.shape[2], tile)
            if not safe:
                raise ValueError(f"unsafe tile axis for serving: {reason}")
        img_spec = P("data", None, "tile") if tile > 1 else P("data")
        return (
            jax.device_put(images, NamedSharding(self.mesh, img_spec)),
            jax.device_put(cams, NamedSharding(self.mesh, P("data"))),
        )

    def _forward_for(self, key: tuple):
        fn = self._forwards.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        from cnmnet_tpu.geometry.camera import invert_intrinsics
        from cnmnet_tpu.kernels import dispatch

        model, variables, k_size = self._model, self._variables, self.k_size

        @jax.jit
        def forward(images, cams):
            out = model.apply(
                variables, self._prepare(images), cams, train=False
            )
            if out.idepth_refined is not None:
                idepth, prob = out.idepth_refined, out.prob_map
            else:  # 2-view path: single-pair disp1, no occlusion head
                idepth, prob = out.disps[0][:, 0], None
            depth = 1.0 / (idepth[..., 0] + 1e-8)
            K_inv = invert_intrinsics(cams[:, 0, 1, :3, :3])
            normal, _ = dispatch.depth_to_normal(depth, K_inv, k_size)
            return idepth[..., 0], depth, prob, normal

        self._forwards[key] = forward
        return forward

    # -- public api -------------------------------------------------------

    def predict(self, images: np.ndarray, cams: np.ndarray) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        images = np.asarray(images)
        cams = np.asarray(cams, np.float32)
        assert images.ndim == 5 and cams.ndim == 5, (images.shape, cams.shape)
        B, V, H, W, _ = images.shape
        with self._lock:
            self._ensure_variables(images, cams)
            bucket = _next_bucket(B, self.buckets)
            if B < bucket:  # pad by replicating the last sample
                reps = [images[-1:]] * (bucket - B)
                images = np.concatenate([images] + reps, axis=0)
                cams = np.concatenate([cams] + [cams[-1:]] * (bucket - B), axis=0)
            elif B > bucket:  # larger than the top bucket: chunk
                outs = [
                    self._predict_unlocked(images[i : i + bucket], cams[i : i + bucket])
                    for i in range(0, B, bucket)
                ]
                return {
                    k: np.concatenate([o[k] for o in outs], axis=0)
                    for k in outs[0]
                    if outs[0][k] is not None
                }
            fn = self._forward_for((bucket, V, H, W))
            idepth, depth, prob, normal = fn(*self._place(images, cams))
        out = {
            "idepth": np.asarray(idepth)[:B].astype(np.float32),
            "depth": np.asarray(depth)[:B].astype(np.float32),
            "normal": np.asarray(normal)[:B].astype(np.float32),
        }
        if prob is not None:
            out["prob"] = np.asarray(prob)[..., 0][:B].astype(np.float32)
        return out

    def _predict_unlocked(self, images, cams):
        # used only from predict() while already holding the lock, with
        # exactly bucket-sized chunks (last chunk may be smaller -> recurse
        # through the padded path without re-locking)
        import jax.numpy as jnp

        B, V, H, W, _ = images.shape
        bucket = _next_bucket(B, self.buckets)
        if B < bucket:
            reps = [images[-1:]] * (bucket - B)
            images = np.concatenate([images] + reps, axis=0)
            cams = np.concatenate([cams] + [cams[-1:]] * (bucket - B), axis=0)
        fn = self._forward_for((bucket, V, H, W))
        idepth, depth, prob, normal = fn(*self._place(images, cams))
        out = {
            "idepth": np.asarray(idepth)[:B].astype(np.float32),
            "depth": np.asarray(depth)[:B].astype(np.float32),
            "normal": np.asarray(normal)[:B].astype(np.float32),
            "prob": None if prob is None else np.asarray(prob)[..., 0][:B].astype(np.float32),
        }
        return out

    def warmup(self, views: int, height: int, width: int):
        """Pre-compile every bucket for one signature (slow-compile host:
        call at deploy time, the persistent cache makes restarts fast)."""
        for b in self.buckets:
            images = np.zeros((b, views, height, width, 3), np.uint8)
            cams = np.broadcast_to(
                np.eye(4, dtype=np.float32), (b, views, 2, 4, 4)
            ).copy()
            cams[:, :, 1, :3, :3] = np.asarray(
                [[100.0, 0, width / 2], [0, 100.0, height / 2], [0, 0, 1]],
                np.float32,
            )
            self.predict(images, cams)


class MicroBatcher:
    """Coalesce concurrent single-frame requests into batched forwards.

    submit(images [V, H, W, 3], cams [V, 2, 4, 4]) -> Future resolving to
    the per-sample slice of InferenceSession.predict's output dict.

    A background thread drains the queue: it waits at most ``max_wait_ms``
    for the batch to fill to ``max_batch``, then runs whatever it has
    (padding to the session's bucket). Under load the wait never triggers —
    the queue refills while the device runs — giving throughput-mode
    batching with bounded added latency when idle.
    """

    def __init__(self, session: InferenceSession, max_batch: int = 8,
                 max_wait_ms: float = 5.0):
        self.session = session
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, images: np.ndarray, cams: np.ndarray) -> Future:
        fut: Future = Future()
        self._q.put((np.asarray(images), np.asarray(cams), fut))
        return fut

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)

    # -- internals --------------------------------------------------------

    def _loop(self):
        import time

        while not self._stop.is_set():
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stop.set()
                    break
                batch.append(nxt)
            try:
                images = np.stack([b[0] for b in batch])
                cams = np.stack([b[1] for b in batch])
                out = self.session.predict(images, cams)
                for i, (_, _, fut) in enumerate(batch):
                    fut.set_result({k: v[i] for k, v in out.items()})
            except Exception as e:  # fail every waiter, keep serving
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
