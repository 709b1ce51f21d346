"""Decisive train-step timing: per-iteration block_until_ready + loss trace.

Async dispatch through the axon tunnel can hide pipelining; this times each
step with a hard sync and prints the loss sequence (proof every step ran and
updated params). Also times the train-mode forward alone for comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnmnet_tpu.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from cnmnet_tpu.config import Config, apply_overrides
from cnmnet_tpu.train.loop import make_train_step, loss_weights_from_config
from cnmnet_tpu.train.losses import compute_losses
from cnmnet_tpu.train.state import create_train_state
from __graft_entry__ import _tiny_batch


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = apply_overrides(
        Config(),
        [
            f"dataset.batch_size={batch_size}",
            "model.num_planes=64",
            "model.compute_dtype=bfloat16",
        ],
    )
    batch = _tiny_batch(batch_size, height=192, width=256)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg)
    batch = jax.device_put(batch)

    w = loss_weights_from_config(cfg)

    @jax.jit
    def fwd_loss(params, batch_stats, epoch, batch):
        out, _ = state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["cams"], train=True,
            mutable=["batch_stats"],
        )
        loss, _ = compute_losses(out, batch, epoch, w)
        return loss

    loss = fwd_loss(state.params, state.batch_stats, state.epoch, batch)
    jax.block_until_ready(loss)
    t0 = time.monotonic()
    for _ in range(20):
        jax.block_until_ready(
            fwd_loss(state.params, state.batch_stats, state.epoch, batch)
        )
    print(f"train-mode fwd+loss: {(time.monotonic()-t0)/20*1e3:.2f} ms (batch {batch_size})")

    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    losses, times = [], []
    for _ in range(20):
        t0 = time.monotonic()
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        times.append(time.monotonic() - t0)
        losses.append(float(metrics["loss"]))
    import numpy as np

    print(
        f"full step (hard sync each iter): median {np.median(times)*1e3:.2f} ms, "
        f"min {min(times)*1e3:.2f} ms (batch {batch_size})"
    )
    print("losses:", " ".join(f"{l:.4f}" for l in losses))


if __name__ == "__main__":
    main()
