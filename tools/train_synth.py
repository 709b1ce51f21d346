"""Synthetic-domain training/fine-tune driver (device-resident pool).

The optimization-machinery validation RESULTS.md reports: trains the full
CNM recipe on procedurally generated scenes (data/synthetic.py) with the
whole pool staged on device (this machine's tunneled H2D would otherwise
dominate: ~0.8 s/batch host collate + transfer vs a 54 ms device step),
then evaluates on fresh held-out scenes.

Usage:
  python tools/train_synth.py --steps 10000 --pool 96 --lr 3e-5 \
      --resume checkpoints_synth/15004 --out checkpoints_synth
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--pool", type=int, default=96)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", default="")
    p.add_argument("--out", default="checkpoints_synth")
    p.add_argument("--eval-scenes", type=int, default=3)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--print-every", type=int, default=500)
    p.add_argument(
        "--overrides", default="",
        help="comma-separated extra config overrides, e.g. "
        "'model.remat=true,model.remat_stages=2,model.remat_refiner=true'",
    )
    args = p.parse_args(argv)

    from cnmnet_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cnmnet_tpu.config import Config, apply_overrides
    from cnmnet_tpu.data.pipeline import collate, normalize_images
    from cnmnet_tpu.data.synthetic import SyntheticScenes
    from cnmnet_tpu.ops import metrics as M
    from cnmnet_tpu.train.checkpoint import CheckpointManager
    from cnmnet_tpu.train.loop import make_train_step
    from cnmnet_tpu.train.state import build_model, create_train_state

    platform = jax.devices()[0].platform
    cfg = apply_overrides(
        Config(),
        [
            f"dataset.batch_size={args.batch}",
            f"dataset.image_height={args.height}",
            f"dataset.image_width={args.width}",
            "model.num_planes=64",
            f"solver.lr={args.lr}",
        ]
        + (["model.compute_dtype=bfloat16"] if platform != "cpu" else [])
        + [o for o in args.overrides.split(",") if o],
    )

    ds = SyntheticScenes(
        num_samples=args.pool,
        height=args.height,
        width=args.width,
        view_num=3,
        seed=args.seed,
    )

    def sample(i):
        s = dict(ds[i])
        s.pop("index", None)
        return s

    print(f"staging {args.pool}-scene pool on device...", flush=True)
    pool = []
    for start in range(0, args.pool, args.batch):
        idx = [(start + j) % args.pool for j in range(args.batch)]
        b = collate([sample(i) for i in idx])
        b["images"] = normalize_images(b["images"])
        b = jax.device_put(b)
        jax.block_until_ready(b)  # surface tunnel stalls at a known point
        pool.append(b)
        if (start // args.batch) % 8 == 7:
            print(f"  staged {start + args.batch}/{args.pool}", flush=True)

    state = create_train_state(cfg, jax.random.PRNGKey(0), pool[0])
    start_step = 0
    mgr = CheckpointManager(os.path.abspath(args.out))
    if args.resume:
        restored = mgr.restore(os.path.abspath(args.resume), state)
        if restored is None:
            raise SystemExit(f"could not restore {args.resume}")
        state = restored
        start_step = int(state.step)
        print(f"resumed from {args.resume} at step {start_step}", flush=True)

    step = make_train_step(cfg)
    rng = np.random.default_rng(args.seed + 1)
    t0 = time.monotonic()
    for it in range(args.steps):
        b = pool[int(rng.integers(len(pool)))]
        state, metrics = step(state, b)
        if (it + 1) % args.print_every == 0:
            loss = float(metrics["loss"])  # hard sync; proves the chain ran
            dt = (time.monotonic() - t0) / (it + 1)
            print(
                f"step {start_step + it + 1}: loss {loss:.4f} "
                f"({dt * 1e3:.1f} ms/step incl. sync)",
                flush=True,
            )
            if not np.isfinite(loss):
                raise SystemExit("loss non-finite; aborting")
    final_step = start_step + args.steps
    mgr.save(state, step=final_step)
    mgr.wait()
    print(f"saved {args.out}/{final_step}", flush=True)

    # held-out eval: fresh scenes from a disjoint seed
    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(images, cams):
        out = model.apply(variables, images, cams, train=False)
        return out.idepth_refined

    hold = SyntheticScenes(
        num_samples=args.eval_scenes,
        height=args.height,
        width=args.width,
        view_num=3,
        seed=args.seed + 777,
    )
    rows = []
    for i in range(args.eval_scenes):
        s = collate([sample_from(hold, i)])
        idepth = np.asarray(fwd(jnp.asarray(s["images"]), jnp.asarray(s["cams"])))
        pred = 1.0 / np.clip(idepth[0, :, :, 0], 1e-2, None)
        gt = np.asarray(s["depths"][0, 0])
        mask = M.compute_valid_depth_mask(gt)
        rows.append(M.compute_errors(np.clip(pred, 0.3, 8.0)[mask], gt[mask]))
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print("held-out:", {k: round(v, 4) for k, v in agg.items()}, flush=True)
    return 0


def sample_from(ds, i):
    s = dict(ds[i])
    s.pop("index", None)
    from cnmnet_tpu.data.pipeline import normalize_images

    s["images"] = normalize_images(s["images"])
    return s


if __name__ == "__main__":
    raise SystemExit(main())
