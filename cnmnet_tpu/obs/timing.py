"""Trustworthy device timing on runtimes that lie to wall clocks.

Two failure modes measured on this machine's tunneled TPU (RESULTS.md
"Timing-methodology note"):

* repeated executions with *identical* inputs can be memoized/elided by the
  remote runtime (a pipelined bench once read 19,149 fps for a 7.5 ms
  forward);
* `jax.block_until_ready` can return before remote execution completes
  (observed on the donated train step), so even per-iteration blocking is
  not proof of work.

`forward_slope_seconds` defeats both: each iteration's input depends on the
previous iteration's output (a 1e-30-scaled scalar fold — numerically a
no-op, but it serializes the chain and makes every input distinct), the
final scalar is fetched by value (proof the whole chain ran), and the
per-call time is the *slope* between a short and a long chain, cancelling
dispatch and round-trip overheads in the intercept.
"""

from __future__ import annotations

import time


def forward_slope_seconds(
    forward, images, cams, k1: int = 8, k2: int = 32, repeats: int = 3
):
    """Per-call device seconds of ``forward(images, cams) -> out`` (out may
    be a tuple; its first element is used as the dependency probe).

    Returns the MEDIAN of ``repeats`` independent slope estimates: a single
    (t2-t1)/(k2-k1) pair is exposed to one unlucky tunnel stall — measured
    round 5, 5 single-slope bench.py runs spread 158.0-159.9 fps with four
    of five within 0.1% of 159.9 (RESULTS.md "flagship variance"), so the
    median-of-3 damps the ~1% outlier draw at ~2x timing cost.
    """
    import statistics

    import jax
    import jax.numpy as jnp

    def first(out):
        return out[0] if isinstance(out, (tuple, list)) else out

    @jax.jit
    def mix(images, probe):
        return images + (1e-30 * jnp.sum(probe)).astype(images.dtype)

    def chain(k):
        imgs = images
        t0 = time.monotonic()
        out = None
        for _ in range(k):
            out = forward(imgs, cams)
            imgs = mix(imgs, first(out))
        float(jnp.sum(first(out)))  # hard value fetch: the chain really ran
        return time.monotonic() - t0

    chain(2)  # settle caches / first-dispatch costs
    slopes = []
    for _ in range(max(1, repeats)):
        t1, t2 = chain(k1), chain(k2)
        slopes.append((t2 - t1) / (k2 - k1))
    return statistics.median(slopes)
