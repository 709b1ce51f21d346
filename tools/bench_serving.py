"""MicroBatcher load test: client-observed latency vs offered load.

VERDICT r4 weak #4 asked for serving measured AS A SYSTEM, not raw forward
numbers: this drives `serve.MicroBatcher` with a Poisson open-loop client
at several offered loads and reports, per load level:

  * p50 / p99 client-observed latency (submit() -> Future.result(), which
    includes the numpy conversion = a real device->host fetch, so the
    tunnel's async-dispatch lie does not apply);
  * achieved throughput (completed requests / wall);
  * coalesced batch-size histogram and padding overhead (padded slots /
    computed slots — the cost of bucket rounding).

Every request uses a DISTINCT image (per-request noise): the runtime
memoizes identical dispatches (CLAUDE.md timing rules), so repeating one
frame would under-report.

Usage:
  python tools/bench_serving.py [--height 192 --width 256] [--views 3]
      [--loads 20,50,100,150] [--requests 200] [--max-wait-ms 3]
      [--buckets 1,4,8]

Prints one JSON line per load level and a final markdown table for
docs/SERVING.md.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnmnet_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--loads", default="20,50,100,150")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--max-wait-ms", type=float, default=3.0)
    ap.add_argument("--buckets", default="1,4,8")
    ap.add_argument("--outputs", default="idepth,depth,prob,normal",
                    help="comma list: which outputs ride the wire")
    ap.add_argument("--wire-dtype", default="float32",
                    choices=["float32", "float16", "bfloat16"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from cnmnet_tpu.config import Config
    from cnmnet_tpu.data.pipeline import collate, quantize_images_u8
    from cnmnet_tpu.data.synthetic import SyntheticScenes
    from cnmnet_tpu.serve import InferenceSession, MicroBatcher

    cfg = Config()
    cfg.dataset.image_height = args.height
    cfg.dataset.image_width = args.width
    buckets = tuple(int(b) for b in args.buckets.split(","))
    session = InferenceSession(
        cfg,
        batch_buckets=buckets,
        outputs=tuple(args.outputs.split(",")),
        wire_dtype=args.wire_dtype,
    )
    print(f"outputs={session.outputs} wire={session.wire_dtype}", flush=True)

    # request pool: one base frame + per-request uint8 noise (distinct
    # dispatches, identical compiled signature)
    ds = SyntheticScenes(
        num_samples=1, height=args.height, width=args.width,
        view_num=args.views,
    )
    base = collate([ds[0]])
    base_img = quantize_images_u8(base["images"])[0]  # [V, H, W, 3]
    cams = base["cams"].astype(np.float32)[0]
    rng = np.random.default_rng(args.seed)
    pool = [
        np.clip(
            base_img.astype(np.int16)
            + rng.integers(-3, 4, base_img.shape, dtype=np.int16),
            0, 255,
        ).astype(np.uint8)
        for _ in range(min(args.requests, 128))
    ]

    print(f"warmup: compiling buckets {session.buckets} ...", flush=True)
    t0 = time.monotonic()
    session.warmup(args.views, args.height, args.width)
    print(f"warmup done in {time.monotonic() - t0:.1f}s", flush=True)

    # instrument coalesced batch sizes via a predict proxy
    class Counting:
        def __init__(self, inner):
            self._inner = inner
            self.sizes = []

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def predict_async(self, images, cams):
            self.sizes.append(images.shape[0])
            return self._inner.predict_async(images, cams)

    rows = []
    for load in (float(x) for x in args.loads.split(",")):
        counting = Counting(session)
        mb = MicroBatcher(
            counting, max_batch=max(buckets), max_wait_ms=args.max_wait_ms
        )
        lat = [None] * args.requests
        lock = threading.Lock()

        def waiter(i, fut, t_submit):
            fut.result()
            with lock:
                lat[i] = time.monotonic() - t_submit

        threads = []
        gaps = rng.exponential(1.0 / load, args.requests)  # Poisson arrivals
        t_start = time.monotonic()
        for i in range(args.requests):
            time.sleep(max(0.0, gaps[i]))
            t_submit = time.monotonic()
            fut = mb.submit(pool[i % len(pool)], cams)
            th = threading.Thread(target=waiter, args=(i, fut, t_submit))
            th.start()
            threads.append(th)
        for th in threads:
            th.join(timeout=300)
        wall = time.monotonic() - t_start
        mb.close()

        lat_ms = np.array([x for x in lat if x is not None]) * 1e3
        sizes = np.array(counting.sizes)
        padded = sum(
            next(b for b in session.buckets if n <= b) - n
            for n in sizes
            if n <= max(session.buckets)
        )
        computed = sum(
            next(b for b in session.buckets if n <= b)
            for n in sizes
            if n <= max(session.buckets)
        )
        row = {
            "offered_rps": load,
            "achieved_rps": round(len(lat_ms) / wall, 1),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
            "mean_batch": round(float(sizes.mean()), 2),
            "batch_hist": {int(k): int(v) for k, v in
                           zip(*np.unique(sizes, return_counts=True))},
            "padding_overhead_pct": round(100.0 * padded / max(computed, 1), 1),
            "requests": int(len(lat_ms)),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| offered req/s | achieved | p50 ms | p99 ms | mean batch | padding % |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['offered_rps']:.0f} | {r['achieved_rps']} | {r['p50_ms']}"
            f" | {r['p99_ms']} | {r['mean_batch']} |"
            f" {r['padding_overhead_pct']} |"
        )


if __name__ == "__main__":
    main()
