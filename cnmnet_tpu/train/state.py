"""Train state: params + BN batch stats + optax optimizer, as one pytree.

The optimizer mirrors the reference recipe (`utils/misc.py:27-42`,
`configs/config.yaml:16-19`): Adam lr 1e-4 with torch-style L2 weight decay
1e-5 (decay added to the gradient *before* the Adam moments — what torch
``Adam(weight_decay=...)`` does, unlike AdamW). sgd/rmsprop/adadelta are kept
as options for parity with the reference's optimizer factory.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from cnmnet_tpu.config import Config
from cnmnet_tpu.models import CNMModel


class CNMTrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)
    epoch: jnp.ndarray = struct.field(default=None)


def add_decayed_weights_active(weight_decay: float) -> optax.GradientTransformation:
    """Torch-style L2 decay, masked per-leaf to leaves that received any
    nonzero gradient this step.

    Fixes the staged-training interaction the reference shares
    (`train.py:89` puts every parameter in one optimizer): a module excluded
    from the forward (e.g. the RefineNet during DepthNet-only pretraining
    on 2-view batches) has an exactly-zero gradient, and plain
    ``add_decayed_weights`` would still shrink it away from its
    initialization every step. Gating on ``any(g != 0)`` leaves genuinely
    trained leaves untouched (their gradients are never identically zero
    over a whole tensor) while keeping frozen leaves bit-identical.
    """

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("add_decayed_weights_active requires params")

        def leaf(u, p):
            active = jnp.any(u != 0).astype(p.dtype)
            return u + weight_decay * active * p

        return jax.tree.map(leaf, updates, params), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    s = cfg.solver
    txs = []
    if s.grad_clip_norm:
        txs.append(optax.clip_by_global_norm(s.grad_clip_norm))
    if s.weight_decay:
        txs.append(add_decayed_weights_active(s.weight_decay))
    lr: Any = s.lr
    if s.warmup_steps:
        lr = optax.linear_schedule(0.0, s.lr, s.warmup_steps)
    method = s.method.lower()
    if method == "adam":
        txs.append(optax.adam(lr))
    elif method == "sgd":
        txs.append(optax.sgd(lr, momentum=0.9))
    elif method == "rmsprop":
        txs.append(optax.rmsprop(lr))
    elif method == "adadelta":
        txs.append(optax.adadelta(lr))
    else:
        raise ValueError(f"unknown solver method {s.method!r}")
    return optax.chain(*txs)


def _remat_stages(cfg: Config) -> int:
    """Resolve model.remat/remat_stages to an encoder stage count, rejecting
    silently-inert combinations (remat=true with stages outside -1|1..5)."""
    if not cfg.model.remat:
        return 0
    n = cfg.model.remat_stages
    if n == -1:
        return 5
    if not 1 <= n <= 5:
        raise ValueError(
            f"model.remat_stages={n} with model.remat=true: expected -1 "
            "(all five encoder stages) or 1-5 (that many from the input side)"
        )
    return n


def build_model(cfg: Config) -> CNMModel:
    return CNMModel(
        idepth_scale=cfg.model.idepth_scale,
        num_planes=cfg.model.num_planes,
        norm=cfg.model.norm,
        dtype=jnp.dtype(cfg.model.compute_dtype),
        cv_backend=cfg.model.cv_backend,
        sampling=cfg.model.sampling,
        use_refiner=cfg.model.use_refiner,
        remat=_remat_stages(cfg),
        remat_refiner=cfg.model.remat_refiner,
        stride2=cfg.model.stride2,
    )


def create_train_state(cfg: Config, rng: jax.Array, sample_batch) -> CNMTrainState:
    """Initialize params/batch_stats from one (host-local) example batch."""
    from cnmnet_tpu.ops.images import prepare_images

    model = build_model(cfg)
    variables = model.init(
        rng, prepare_images(sample_batch["images"]), sample_batch["cams"],
        train=False,
    )
    return CNMTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        epoch=jnp.zeros((), jnp.int32),
        tx=make_optimizer(cfg),
    )
