"""Inference serving: checkpointed sessions + request micro-batching.

The reference has no serving story (its `eval.py` loops one frame at a
time); this module is the deployment counterpart the brief's "production
serving" goal asks for, built around three TPU facts measured in RESULTS.md:

* batch-1 latency is dispatch-bound (~7.5 ms/frame) while the device is
  compute-bound from batch 4 up (~5.4 ms/frame, 187 frames/s at batch 16)
  — so online serving wants *micro-batching*;
* every distinct (batch, views, H, W) signature is a separate XLA program
  (15-20 min cold compiles on this machine) — so batch sizes must be
  bucketed to a small fixed set and padded, never compiled per request;
* on transfer-constrained links the device->host result fetch, not the
  forward, bounds throughput (measured 7x the compute here) — so outputs
  ride ONE packed array of only the selected maps (optionally f16) and
  the batcher double-buffers dispatch against fetch (docs/SERVING.md).

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
      -> dict of float32 numpy arrays: idepth [B, H, W], depth [B, H, W],
         prob [B, H, W] (refined path only), normal [B, H, W, 3] —
         restricted to the session's ``outputs`` selection.

    Batches are padded up to the next bucket (replicating the last frame —
    cheaper than a guard compile) and cropped back; results are unaffected
    (inference is per-sample; BN runs in eval mode on running stats).

    The selected outputs travel device->host as ONE packed array in
    ``wire_dtype`` (see __init__) — on bandwidth-constrained links this is
    the difference between fetch-bound and compute-bound serving.
    """

    OUTPUT_CHANNELS = {"idepth": 1, "depth": 1, "prob": 1, "normal": 3}

    def __init__(
        self,
        cfg: Optional[Config] = None,
        checkpoint: Optional[str] = None,
        batch_buckets: Sequence[int] = (1, 4, 8),
        k_size: Optional[int] = None,
        mesh=None,
        outputs: Sequence[str] = ("idepth", "depth", "prob", "normal"),
        wire_dtype: str = "float32",
    ):
        import copy

        import jax

        from cnmnet_tpu.cache import enable_compilation_cache

        enable_compilation_cache()
        # Output wire contract. The compiled forward packs the SELECTED
        # outputs into ONE [B, H, W, C] array cast to ``wire_dtype`` so a
        # predict costs a single device->host transfer of only the bytes
        # asked for. Measured round 5 on this host's tunneled TPU: the
        # four-array f32 fetch (9.4 MB/batch-8 at ~28 MB/s) was 7x the
        # batch's compute time and capped the MicroBatcher at ~15 req/s
        # (docs/SERVING.md "measured under load"). float16 halves wire
        # bytes at ~5e-4 relative output quantization; outputs not
        # selected are not computed (dropping "normal" also skips the
        # depth->normal operator). Results are returned as float32 numpy
        # regardless of the wire dtype.
        bad = set(outputs) - set(self.OUTPUT_CHANNELS)
        if bad:
            raise ValueError(f"unknown outputs {sorted(bad)}; "
                             f"choose from {sorted(self.OUTPUT_CHANNELS)}")
        if wire_dtype not in ("float32", "float16", "bfloat16"):
            raise ValueError(f"unsupported wire_dtype {wire_dtype!r}")
        self.outputs = tuple(outputs)
        self.wire_dtype = wire_dtype
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
        """Jitted packed forward for one (bucket, V, H, W) signature.

        Returns ``(fn, layout)``: ``fn(images, cams) -> [B, H, W, C]`` in
        the session's wire dtype, ``layout`` the static list of
        ``(name, n_channels)`` slices packed into the last axis."""
        hit = self._forwards.get(key)
        if hit is not None:
            return hit
        import jax
        import jax.numpy as jnp

        from cnmnet_tpu.geometry.camera import invert_intrinsics
        from cnmnet_tpu.kernels import dispatch

        model, variables, k_size = self._model, self._variables, self.k_size
        V = key[1]
        # the 2-view path has no refiner pass, hence no occlusion prob map
        has_prob = V >= 3 and self.cfg.model.use_refiner
        layout = [
            (name, self.OUTPUT_CHANNELS[name])
            for name in self.outputs
            if name != "prob" or has_prob
        ]
        wire = jnp.dtype(self.wire_dtype)
        want = {name for name, _ in layout}

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
            parts = {"idepth": idepth, "depth": depth[..., None]}
            if has_prob:
                parts["prob"] = prob
            if "normal" in want:
                K_inv = invert_intrinsics(cams[:, 0, 1, :3, :3])
                normal, _ = dispatch.depth_to_normal(depth, K_inv, k_size)
                parts["normal"] = normal
            packed = jnp.concatenate(
                [parts[name] for name, _ in layout], axis=-1
            )
            if wire != packed.dtype:
                # saturate instead of overflowing to inf: raw depth
                # (1/idepth, unclamped) can exceed float16's 65504 max
                fin = jnp.finfo(wire)
                packed = jnp.clip(packed, fin.min, fin.max)
            return packed.astype(wire)

        self._forwards[key] = (forward, layout)
        return forward, layout

    @staticmethod
    def _unpack(packed, layout, B: int) -> Dict[str, np.ndarray]:
        """ONE device->host fetch of the packed wire array, split per the
        layout; scalars lose their channel dim, everything back to f32."""
        arr = np.asarray(packed)  # the single transfer
        out, c = {}, 0
        for name, nc in layout:
            a = arr[:B, ..., c : c + nc]
            c += nc
            if nc == 1:
                a = a[..., 0]
            out[name] = a.astype(np.float32)
        return out

    # -- public api -------------------------------------------------------

    def predict(self, images: np.ndarray, cams: np.ndarray) -> Dict[str, np.ndarray]:
        images = np.asarray(images)
        cams = np.asarray(cams, np.float32)
        assert images.ndim == 5 and cams.ndim == 5, (images.shape, cams.shape)
        B = images.shape[0]
        with self._lock:
            self._ensure_variables(images, cams)
            bucket = _next_bucket(B, self.buckets)
            if B > bucket:  # larger than the top bucket: chunk
                outs = [
                    self.fetch(self._dispatch_unlocked(
                        images[i : i + bucket], cams[i : i + bucket]
                    ))
                    for i in range(0, B, bucket)
                ]
                return {
                    k: np.concatenate([o[k] for o in outs], axis=0)
                    for k in outs[0]
                }
            handle = self._dispatch_unlocked(images, cams)
        return self.fetch(handle)

    def predict_async(self, images: np.ndarray, cams: np.ndarray):
        """Dispatch one batch WITHOUT blocking on the result: upload +
        launch happen now (XLA dispatch is async), the device->host
        transfer is deferred to ``fetch(handle)``. This is the
        double-buffering primitive: dispatching batch N+1 before fetching
        batch N overlaps its upload and compute with N's fetch — on
        transfer-bound links (docs/SERVING.md) that's most of the step.
        Batch must fit the top bucket (use predict() for larger)."""
        images = np.asarray(images)
        cams = np.asarray(cams, np.float32)
        assert images.ndim == 5 and cams.ndim == 5, (images.shape, cams.shape)
        if images.shape[0] > self.buckets[-1]:
            raise ValueError(
                f"predict_async batch {images.shape[0]} exceeds the top "
                f"bucket {self.buckets[-1]}; chunk via predict()"
            )
        with self._lock:
            self._ensure_variables(images, cams)
            return self._dispatch_unlocked(images, cams)

    def fetch(self, handle) -> Dict[str, np.ndarray]:
        """Blocking device->host transfer of a predict_async handle."""
        packed, layout, B = handle
        return self._unpack(packed, layout, B)

    def _dispatch_unlocked(self, images, cams):
        # used only while holding the lock, with chunks no larger than the
        # top bucket (smaller ones pad by replicating the last sample —
        # cheaper than a guard compile; results are unaffected, inference
        # is per-sample with BN on running stats)
        B, V, H, W, _ = images.shape
        bucket = _next_bucket(B, self.buckets)
        if B < bucket:
            reps = [images[-1:]] * (bucket - B)
            images = np.concatenate([images] + reps, axis=0)
            cams = np.concatenate([cams] + [cams[-1:]] * (bucket - B), axis=0)
        fn, layout = self._forward_for((bucket, V, H, W))
        packed = fn(*self._place(images, cams))
        return (packed, layout, B)

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

    The loop is DOUBLE-BUFFERED: while one batch's result is being fetched
    (device->host — the dominant cost on transfer-bound links), the next
    batch is already collected, uploaded and dispatched
    (``InferenceSession.predict_async``). Under saturation the link runs
    upload(N+1) concurrent with fetch(N) and the device computes while
    both transfer; when idle the path degenerates to today's
    collect->run->resolve with no added latency.
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

    def _collect(self, block: bool):
        """One coalesced batch. ``block``: wait for the first item (idle
        path); otherwise take only what's already queued — a pending
        dispatch is in flight and must not be delayed. Returns [] when
        nothing is available or the stop sentinel arrives."""
        import time

        batch = []
        try:
            item = self._q.get(block=block)
        except queue.Empty:
            return batch
        if item is None:
            self._stop.set()
            return batch
        batch.append(item)
        deadline = time.monotonic() + (self.max_wait if block else 0.0)
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
            try:
                nxt = self._q.get(timeout=left) if left > 0 else self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                self._stop.set()
                break
            batch.append(nxt)
        return batch

    def _dispatch(self, batch):
        """predict_async one collected batch -> (batch, handle) or None
        (every waiter failed)."""
        try:
            images = np.stack([b[0] for b in batch])
            cams = np.stack([b[1] for b in batch])
            return batch, self.session.predict_async(images, cams)
        except Exception as e:
            for _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
            return None

    def _resolve(self, pending):
        batch, handle = pending
        try:
            out = self.session.fetch(handle)
            for i, (_, _, fut) in enumerate(batch):
                fut.set_result({k: v[i] for k, v in out.items()})
        except Exception as e:  # fail every waiter, keep serving
            for _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)

    def _loop(self):
        pending = None
        while True:
            if pending is None and self._stop.is_set():
                return
            # dispatch the NEXT batch before fetching the pending one:
            # its upload+compute overlap the pending device->host transfer
            batch = self._collect(block=pending is None)
            dispatched = self._dispatch(batch) if batch else None
            if pending is not None:
                self._resolve(pending)
            pending = dispatched
