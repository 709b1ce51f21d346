"""Probe: compile the dryrun_multichip train step and report which
collectives GSPMD inserted (root-causing the CollectivePermute rendezvous
crash in MULTICHIP_r01.json).

Usage: JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/probe_multichip_hlo.py [n_devices] [tile]
"""

from __future__ import annotations

import collections
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cnmnet_tpu.config import Config
from cnmnet_tpu.parallel.mesh import make_mesh
from cnmnet_tpu.train.loop import make_train_step
from cnmnet_tpu.train.state import create_train_state


def _tiny_batch(batch_size, height=32, width=64, views=3):
    from cnmnet_tpu.data.pipeline import collate, normalize_images
    from cnmnet_tpu.data.synthetic import SyntheticScenes

    ds = SyntheticScenes(num_samples=batch_size, height=height, width=width, view_num=views)
    batch = collate([ds[i] for i in range(batch_size)])
    batch["images"] = normalize_images(batch["images"])
    batch.pop("index", None)
    return batch


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mesh = make_mesh(data=n // tile, tile=tile)

    cfg = Config()
    cfg.model.num_planes = 16
    cfg.model.k_size = 5
    cfg.dataset.batch_size = mesh.shape["data"]
    cfg.train.use_normal_loss = True

    batch = _tiny_batch(mesh.shape["data"], height=32, width=64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    batch = {
        k: jax.device_put(v, NamedSharding(mesh, P(*(("data",) + (None,) * (v.ndim - 1)))))
        for k, v in batch.items()
    }

    step = make_train_step(cfg, mesh=None)
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    counts = collections.Counter()
    for m in re.finditer(r"(collective-permute|all-reduce|all-gather|all-to-all|reduce-scatter)(?:-start)?\(", hlo):
        counts[m.group(1)] += 1
    print(f"mesh={dict(mesh.shape)} collectives: {dict(counts)}")
    # print the instruction lines for collective-permutes with context
    for line in hlo.splitlines():
        if "collective-permute" in line and "=" in line:
            print("  CP:", line.strip()[:300])


if __name__ == "__main__":
    main()
