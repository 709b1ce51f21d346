"""Checkpoint / resume via orbax.

Counterpart of the reference's `torch.save` dict of {epoch, global_step, two
state_dicts, optimizer} written 8x/epoch (`train.py:402-410`) — here the
whole :class:`CNMTrainState` pytree (params, BN stats, optimizer moments,
counters) is checkpointed atomically and shard-aware (each host writes its
own shards), with retention of the latest N steps.

To mirror the reference's deliberate choice of *not* restoring optimizer
state on resume (`train.py:103`), ``restore(..., with_optimizer=False)``
resets ``opt_state`` to a fresh init.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from cnmnet_tpu.train.state import CNMTrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 8):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: CNMTrainState, step: Optional[int] = None):
        step = int(state.step) if step is None else int(step)
        if step in self._mgr.all_steps():
            return step  # idempotent: interval + epoch-end saves can collide
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        return step

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self,
        directory_or_step,
        template: CNMTrainState,
        with_optimizer: bool = True,
    ) -> Optional[CNMTrainState]:
        """Restore into the structure of ``template``.

        directory_or_step: an int step in this manager, a checkpoint dir
        path, or None/"latest" for the newest step here.
        """
        step = None
        if isinstance(directory_or_step, int):
            step = directory_or_step
        elif directory_or_step in (None, "latest"):
            step = self._mgr.latest_step()
            if step is None:
                return None
        if step is not None:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            path = os.path.abspath(str(directory_or_step))
            # A manager root (numeric step subdirectories, e.g. the
            # reference-style `resume_dir=<checkpoints>`): open it as a
            # manager and restore its newest step. A manager *step* dir
            # (`<checkpoints>/<step>`) restores that step via its parent.
            steps = [
                int(d) for d in os.listdir(path) if d.isdigit()
            ] if os.path.isdir(path) else []
            base = os.path.basename(path)
            if steps:
                other = ocp.CheckpointManager(path)
                restored = other.restore(
                    max(steps), args=ocp.args.StandardRestore(template)
                )
            elif base.isdigit():
                other = ocp.CheckpointManager(os.path.dirname(path))
                restored = other.restore(
                    int(base), args=ocp.args.StandardRestore(template)
                )
            else:
                ckptr = ocp.StandardCheckpointer()
                restored = ckptr.restore(path, template)
        if not with_optimizer:
            restored = restored.replace(
                opt_state=template.tx.init(restored.params)
            )
        return restored
