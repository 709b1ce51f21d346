"""The jit-compiled training step and epoch driver.

Replaces the reference's Python train loops (`train.py:139-410, 485-656`)
with one compiled program per step:

* forward (cost volumes + DepthNet folded over source pairs + RefineNet),
  the full multi-term loss, backward, and the Adam update are a single
  ``jax.jit`` — no host round-trips inside the step;
* BN batch statistics flow through flax's mutable ``batch_stats`` collection
  (the reference's torch BN updates running stats implicitly);
* distribution is declarative: the batch arrives sharded over the "data"
  mesh axis, parameters replicated; GSPMD turns gradient/BN reductions into
  psums over ICI/DCN. No pmap, no explicit collectives in the step;
* metrics are returned as a dict of scalars; the driver logs every
  ``print_interval`` steps and checkpoints ``checkpoints_per_epoch`` times
  per epoch (`train.py:402-410`).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cnmnet_tpu.config import Config
from cnmnet_tpu.train.losses import LossWeights, compute_losses
from cnmnet_tpu.train.state import CNMTrainState, create_train_state


def loss_weights_from_config(cfg: Config) -> LossWeights:
    return LossWeights(
        use_normal_loss=cfg.train.use_normal_loss,
        use_normal_refined_by_planes=cfg.train.use_normal_refined_by_planes,
        curriculum_epochs=cfg.train.curriculum_epochs,
        prob_weight=cfg.train.prob_weight,
        include_prob_map_loss=cfg.train.include_prob_map_loss,
        k_size=cfg.model.k_size,
        normal_backend=cfg.model.cv_backend,
    )


def make_train_step(cfg: Config, mesh: Optional[Mesh] = None) -> Callable:
    """Build the jitted (state, batch) -> (state, metrics) step."""
    w = loss_weights_from_config(cfg)

    def step(state: CNMTrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"],
                batch["cams"],
                train=True,
                mutable=["batch_stats"],
            )
            loss, metrics = compute_losses(out, batch, state.epoch, w)
            return loss, (metrics, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads))
        )
        return state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))

        def batch_shardings(batch):
            return {
                k: NamedSharding(mesh, P(*(("data",) + (None,) * (v.ndim - 1))))
                for k, v in batch.items()
            }

        jitted = jax.jit(step, donate_argnums=(0,))

        def sharded_step(state, batch):
            batch = jax.device_put(batch, batch_shardings(batch))
            state = jax.device_put(state, repl) if state.step == 0 else state
            del data
            return jitted(state, batch)

        return sharded_step
    return jax.jit(step, donate_argnums=(0,))


def train_loop(
    cfg: Config,
    data_iter_fn: Callable[[], Iterator[Dict]],
    mesh: Optional[Mesh] = None,
    logger=None,
    checkpointer=None,
    max_steps: Optional[int] = None,
) -> CNMTrainState:
    """Epoch driver: init (or resume), iterate, log, checkpoint."""
    rng = jax.random.PRNGKey(cfg.train.seed)
    first = next(iter(data_iter_fn()))
    state = create_train_state(cfg, rng, first)
    start_epoch = 0
    if checkpointer is not None and cfg.train.resume_dir:
        restored = checkpointer.restore(cfg.train.resume_dir, state)
        if restored is not None:
            state = restored
            start_epoch = int(state.epoch)

    step_fn = make_train_step(cfg, mesh)
    global_step = int(state.step)

    for epoch in range(start_epoch, cfg.train.num_epochs):
        state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        tic = time.monotonic()
        for it, batch in enumerate(data_iter_fn()):
            if cfg.train.steps_per_epoch and it >= cfg.train.steps_per_epoch:
                break
            state, metrics = step_fn(state, batch)
            global_step += 1
            if max_steps and global_step >= max_steps:
                return state
            if logger is not None and it % cfg.train.print_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["step_time"] = (time.monotonic() - tic) / (it + 1)
                logger.log_scalars(global_step, metrics, prefix=f"epoch {epoch}")
        if checkpointer is not None:
            checkpointer.save(state, step=global_step)
    return state
