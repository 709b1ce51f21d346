"""Command-line entry: train / eval / bench / prep.

Replaces the reference's sacred commands (`train.py train`, `eval.py
eval_refine`, ... — `README.md:42-58`) with one typed CLI:

    python -m cnmnet_tpu.cli train [--config cfg.yaml] [k.subkey=value ...]
    python -m cnmnet_tpu.cli train --synthetic            # no dataset needed
    python -m cnmnet_tpu.cli eval --views 3 dataset.root_dir=/data/7scenes
    python -m cnmnet_tpu.cli prep-cameras --scene-dir ... # offline tools

Dotted overrides keep the reference's ergonomics: `dataset.batch_size=5`.
"""

from __future__ import annotations

import argparse
import os
import sys

from cnmnet_tpu.config import Config, apply_overrides, load_config, to_dict


def _parse(argv):
    p = argparse.ArgumentParser(prog="cnmnet_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train the CNM pipeline")
    t.add_argument("--config", default=None)
    t.add_argument("--synthetic", action="store_true", help="procedural data")
    t.add_argument("--wo-normal", action="store_true", help="train_wo_normal recipe")
    t.add_argument("--max-steps", type=int, default=None)
    t.add_argument("overrides", nargs="*")

    e = sub.add_parser("eval", help="7-Scenes evaluation")
    e.add_argument("--config", default=None)
    e.add_argument("--views", type=int, default=3, choices=[2, 3, 5, 7])
    e.add_argument("--checkpoint", default=None)
    e.add_argument("--save-dir", default=None)
    e.add_argument("--max-frames-per-seq", type=int, default=None)
    e.add_argument("--frame-batch", type=int, default=1,
                   help="frames per batched forward (data-parallel inference)")
    e.add_argument("--eval-tile", type=int, default=1,
                   help="shard image ROWS over this many devices per frame "
                        "(spatial partitioning for native-res eval)")
    e.add_argument("overrides", nargs="*")

    cm = sub.add_parser(
        "cal-metrics",
        help="re-aggregate metrics over a saved eval artifact dir "
             "(the reference's standalone cal_metrics, eval.py:995-1090)",
    )
    cm.add_argument("data_dir", help="artifact root: <scene>/<seq>/{pred,gt}_depth")
    cm.add_argument("--gt-root", default=None,
                    help="7-Scenes dataset root; GT read from its depth.png "
                         "instead of the saved gt_depth npy (reference exact)")
    cm.add_argument("--min-depth", type=float, default=0.3)
    cm.add_argument("--max-depth", type=float, default=8.0)

    es = sub.add_parser("eval-scannet", help="ScanNet test-set evaluation")
    es.add_argument("--config", default=None)
    es.add_argument("--checkpoint", default=None)
    es.add_argument("--synthetic", action="store_true", help="procedural data")
    es.add_argument("--planes", action="store_true",
                    help="also run the per-plane PlaneNet metric suite")
    es.add_argument("--max-samples", type=int, default=None)
    es.add_argument("overrides", nargs="*")

    b = sub.add_parser("bench", help="single-chip throughput benchmark")

    inf = sub.add_parser(
        "infer",
        help="offline batched inference over .npz frames (serve.InferenceSession)",
    )
    inf.add_argument("--config", default=None)
    inf.add_argument("--checkpoint", default=None)
    inf.add_argument("--inputs", required=True,
                     help="glob of .npz files with arrays images [V,H,W,3] "
                          "(uint8 or normalized f32) and cams [V,2,4,4]")
    inf.add_argument("--out-dir", required=True)
    inf.add_argument("--batch", type=int, default=8)
    inf.add_argument("overrides", nargs="*")

    pc = sub.add_parser("prep-cameras", help="ScanNet pose+K -> cameras/*_cam.txt")
    pc.add_argument("--scene-dir", required=True)
    pc.add_argument("--out-width", type=int, default=256)
    pc.add_argument("--out-height", type=int, default=192)

    pp = sub.add_parser("prep-planes", help="PlaneRCNN annotations -> per-frame plane segs/params")
    pp.add_argument("--scene-dir", required=True)
    pp.add_argument("--num-workers", type=int, default=4)
    pp.add_argument("--limit", type=int, default=None)

    rp = sub.add_parser(
        "report", help="HTML galleries over an eval artifact dir"
    )
    rp.add_argument("run_dir")
    rp.add_argument("--compare", nargs="*", default=None,
                    help="additional run dirs for a side-by-side page")
    rp.add_argument("--image-width", type=int, default=256)

    tb = sub.add_parser(
        "export-tb", help="convert a run dir's events.jsonl to TensorBoard format"
    )
    tb.add_argument("run_dir")
    tb.add_argument("--out", default=None)

    pl_ = sub.add_parser("prep-list", help="generate a train list")
    pl_.add_argument("--root-dir", required=True)
    pl_.add_argument("--out", required=True)
    pl_.add_argument("--interval", type=int, default=10)
    pl_.add_argument("--view-num", type=int, default=3)
    pl_.add_argument("--frame-stride", type=int, default=5)

    return p.parse_args(argv)


def _build_config(args) -> Config:
    cfg = load_config(getattr(args, "config", None))
    overrides = list(getattr(args, "overrides", []))
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def cmd_train(args) -> int:
    cfg = _build_config(args)
    if args.wo_normal:
        cfg.train.use_normal_loss = False
    if args.synthetic:
        cfg.dataset.synthetic = True

    import jax

    from cnmnet_tpu.obs.logger import MetricLogger
    from cnmnet_tpu.parallel.mesh import make_mesh
    from cnmnet_tpu.train.checkpoint import CheckpointManager
    from cnmnet_tpu.train.loop import train_loop

    if cfg.parallel.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=cfg.parallel.coordinator_address,
            num_processes=cfg.parallel.num_processes,
            process_id=cfg.parallel.process_id,
        )
        # Multi-process orbax saves coordinate through the primary's
        # metadata writes: every process MUST point at the same (shared)
        # checkpoint directory, or the save-finalize barrier deadlocks ~10
        # minutes into the first checkpoint. Fail loudly at startup instead
        # (compare a fixed-size digest: no truncation at any path length).
        import hashlib

        from jax.experimental import multihost_utils

        multihost_utils.assert_equal(
            jax.numpy.frombuffer(
                hashlib.sha256(cfg.train.checkpoint_dir.encode()).digest(),
                dtype=jax.numpy.uint8,
            ),
            "train.checkpoint_dir must be one shared path across processes "
            "(orbax multi-process checkpointing contract)",
        )

    # The data axis cannot exceed what the global batch divides into; shrink
    # (with a visible note) rather than erroring on small smoke runs.
    import math

    n_dev = len(jax.devices())  # GLOBAL device count in multi-process runs
    tile = cfg.parallel.tile_axis
    data = cfg.parallel.data_axis if cfg.parallel.data_axis != -1 else n_dev // tile
    # batch_size is HOST-local; divisibility is against the global batch
    global_batch = cfg.dataset.batch_size * jax.process_count()
    usable = math.gcd(global_batch, data)
    if usable != data:
        print(
            f"note: global batch {global_batch} not divisible by "
            f"data axis {data}; using a {usable}-way data mesh"
        )
        data = usable
    if jax.process_count() > 1 and data * tile != n_dev:
        raise ValueError(
            f"multi-process runs must use every device: mesh {data}x{tile} "
            f"!= {n_dev} global devices (pick batch/axes accordingly)"
        )
    mesh = make_mesh(
        data=data, tile=tile, devices=jax.devices()[: data * tile]
    )
    logger = MetricLogger(cfg.train.log_dir, config=to_dict(cfg))
    checkpointer = CheckpointManager(
        cfg.train.checkpoint_dir, max_to_keep=cfg.train.ckpt_keep
    )

    if cfg.dataset.synthetic:
        from cnmnet_tpu.data.synthetic import SyntheticScenes

        ds = SyntheticScenes(
            num_samples=cfg.dataset.synthetic_size,
            height=cfg.dataset.image_height,
            width=cfg.dataset.image_width,
            view_num=cfg.dataset.view_num,
            seed=cfg.train.seed,
        )

        def data_iter():
            return ds.batches(
                cfg.dataset.batch_size,
                epochs=1,
                wire_dtype=cfg.dataset.wire_dtype,
            )

        epoch_len = cfg.dataset.synthetic_size // cfg.dataset.batch_size
    else:
        from cnmnet_tpu.data.pipeline import PrefetchLoader
        from cnmnet_tpu.data.scannet import ScanNetDataset

        ds = ScanNetDataset(
            list_filepath=cfg.dataset.list_filepath,
            root_dir=cfg.dataset.root_dir,
            view_num=cfg.dataset.view_num,
            interval=cfg.dataset.interval,
            depth_scale=cfg.dataset.depth_scale,
            image_height=cfg.dataset.image_height,
            image_width=cfg.dataset.image_width,
            max_planes=cfg.dataset.max_planes,
            wire_dtype=cfg.dataset.wire_dtype,
        )
        # Multi-host data parallelism: each host loads a disjoint shard of
        # the epoch's index stream (same shuffle seed everywhere -> a
        # consistent global partition). batch_size stays host-local.
        loader = PrefetchLoader(
            ds,
            batch_size=cfg.dataset.batch_size,
            num_workers=cfg.dataset.num_workers,
            seed=cfg.train.seed,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
        )

        def data_iter():
            return iter(loader)

        epoch_len = len(loader)

    if cfg.train.ckpt_interval is None:
        # the reference's 8x/epoch cadence (`train.py:402-410`)
        if cfg.train.steps_per_epoch:
            epoch_len = min(epoch_len, cfg.train.steps_per_epoch)
        cfg.train.ckpt_interval = max(1, epoch_len // 8)

    state = train_loop(
        cfg,
        data_iter,
        mesh=mesh,
        logger=logger,
        checkpointer=checkpointer,
        max_steps=args.max_steps,
    )
    print(f"done: step {int(state.step)}")
    return 0


def cmd_eval(args) -> int:
    cfg = _build_config(args)
    import jax

    from cnmnet_tpu.evals.seven_scenes_eval import (
        evaluate_seven_scenes,
        make_eval_forward,
    )
    from cnmnet_tpu.train.checkpoint import CheckpointManager
    from cnmnet_tpu.train.state import build_model, create_train_state
    from cnmnet_tpu.data.synthetic import SyntheticScenes
    from cnmnet_tpu.data.pipeline import collate, normalize_images

    model = build_model(cfg)
    num_sources = {2: 1, 3: 2, 5: 4, 7: 6}[args.views]

    # initialize params (shape-only batch), then restore the checkpoint
    ds = SyntheticScenes(
        num_samples=1,
        height=cfg.dataset.image_height,
        width=cfg.dataset.image_width,
        view_num=1 + num_sources,
    )
    batch = collate([ds[0]])
    batch["images"] = normalize_images(batch["images"])
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    if args.checkpoint:
        mgr = CheckpointManager(cfg.train.checkpoint_dir)
        state = mgr.restore(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Multi-chip eval: data-parallel over the frame batch, optionally
    # spatially partitioned over "tile" (image rows) per frame — the
    # batched protocol loops, `eval.py:635-663`, scaled over chips. Every
    # device is used: the frame batch is rounded UP to a multiple of the
    # data axis (the tail batch is already padded inside the eval loop, so
    # the adjustment costs only the padding frames' compute).
    mesh = None
    frame_batch = args.frame_batch
    n_dev = len(jax.devices())
    tile = max(1, args.eval_tile)
    if (frame_batch > 1 or tile > 1) and n_dev > 1:
        from cnmnet_tpu.parallel.mesh import make_mesh

        if n_dev % tile:
            print(f"eval-tile={tile} does not divide {n_dev} devices; "
                  "running unsharded")
            tile = 1
        if tile > 1:
            from cnmnet_tpu.parallel.sharding import tile_partition_safe

            safe, reason = tile_partition_safe(cfg.dataset.image_height, tile)
            if not safe:
                print(f"eval-tile={tile} DISABLED (falling back to pure "
                      f"data-parallel): {reason}")
                tile = 1
        data = n_dev // tile
        if data > 1 and frame_batch % data:
            frame_batch = ((frame_batch + data - 1) // data) * data
            print(f"frame-batch rounded up {args.frame_batch} -> "
                  f"{frame_batch} so all {data} data-axis devices are used")
        if data * tile > 1:
            mesh = make_mesh(data=data, tile=tile)
            print(f"eval mesh: data={data} tile={tile}")

    forward = make_eval_forward(model, variables, k_size=cfg.model.k_size)
    result = evaluate_seven_scenes(
        forward,
        cfg.dataset.root_dir,
        num_sources=num_sources,
        image_height=cfg.dataset.image_height,
        image_width=cfg.dataset.image_width,
        save_dir=args.save_dir,
        max_frames_per_seq=args.max_frames_per_seq,
        frame_batch=frame_batch,
        mesh=mesh,
        wire_dtype=cfg.dataset.wire_dtype,
    )
    for k, v in result.items():
        print(f"{k}: {v:.4f}")
    return 0


def cmd_cal_metrics(args) -> int:
    from cnmnet_tpu.evals.cal_metrics import cal_metrics

    result = cal_metrics(
        args.data_dir,
        gt_root=args.gt_root,
        min_depth=args.min_depth,
        max_depth=args.max_depth,
    )
    for k, v in result.items():
        print(f"{k}: {v:.4f}")
    print(f"wrote {args.data_dir}/evaluation_errors.txt")
    return 0


def cmd_eval_scannet(args) -> int:
    cfg = _build_config(args)
    import jax

    from cnmnet_tpu.data.pipeline import collate, normalize_images
    from cnmnet_tpu.data.synthetic import SyntheticScenes
    from cnmnet_tpu.evals.scannet_eval import (
        evaluate_scannet,
        evaluate_scannet_planes,
    )
    from cnmnet_tpu.evals.seven_scenes_eval import make_eval_forward
    from cnmnet_tpu.train.checkpoint import CheckpointManager
    from cnmnet_tpu.train.state import build_model, create_train_state

    model = build_model(cfg)
    if args.synthetic:
        ds = SyntheticScenes(
            num_samples=cfg.dataset.synthetic_size,
            height=cfg.dataset.image_height,
            width=cfg.dataset.image_width,
            view_num=cfg.dataset.view_num,
            seed=cfg.train.seed,
        )

        class _Normalized:
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                s = dict(ds[i])
                s["images"] = normalize_images(s["images"])
                return s

        dataset = _Normalized()
    else:
        from cnmnet_tpu.data.scannet import ScanNetDataset

        dataset = ScanNetDataset(
            list_filepath=cfg.dataset.test_list_filepath
            or cfg.dataset.list_filepath,
            root_dir=cfg.dataset.root_dir,
            view_num=cfg.dataset.view_num,
            interval=cfg.dataset.interval,
            depth_scale=cfg.dataset.depth_scale,
            image_height=cfg.dataset.image_height,
            image_width=cfg.dataset.image_width,
            max_planes=cfg.dataset.max_planes,
            wire_dtype=cfg.dataset.wire_dtype,
        )

    batch = collate([dataset[0]])
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    if args.checkpoint:
        mgr = CheckpointManager(cfg.train.checkpoint_dir)
        state = mgr.restore(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    forward = make_eval_forward(model, variables, k_size=cfg.model.k_size)

    result = evaluate_scannet(forward, dataset, max_samples=args.max_samples)
    for k, v in result.items():
        print(f"{k}: {v:.4f}")
    if args.planes:
        planes = evaluate_scannet_planes(
            forward, dataset, max_samples=args.max_samples
        )
        for k, v in planes.items():
            print(f"{k}: {v:.4f}")
    return 0


def cmd_bench(_args) -> int:
    import bench

    bench.main()
    return 0


def cmd_infer(args) -> int:
    """Offline batched inference: .npz frames -> depth/normal/prob .npz."""
    import glob as globmod
    import os

    import numpy as np

    cfg = _build_config(args)
    from cnmnet_tpu.serve import InferenceSession

    paths = sorted(globmod.glob(args.inputs))
    if not paths:
        print(f"no inputs match {args.inputs!r}")
        return 1
    os.makedirs(args.out_dir, exist_ok=True)
    session = InferenceSession(
        cfg, checkpoint=args.checkpoint, batch_buckets=(1, args.batch)
    )
    pending, names = [], []

    def flush():
        if not pending:
            return
        images = np.stack([p[0] for p in pending])
        cams = np.stack([p[1] for p in pending])
        out = session.predict(images, cams)
        for i, name in enumerate(names):
            np.savez(
                os.path.join(args.out_dir, name + ".pred.npz"),
                **{k: v[i] for k, v in out.items()},
            )
        pending.clear()
        names.clear()

    for path in paths:
        with np.load(path) as z:
            pending.append((np.asarray(z["images"]), np.asarray(z["cams"])))
        names.append(os.path.splitext(os.path.basename(path))[0])
        if len(pending) >= args.batch:
            flush()
    flush()
    print(f"wrote {len(paths)} predictions to {args.out_dir}")
    return 0


def cmd_prep_cameras(args) -> int:
    from cnmnet_tpu.data.prep import make_camera_files

    n = make_camera_files(args.scene_dir, args.out_width, args.out_height)
    print(f"wrote {n} camera files")
    return 0


def cmd_prep_planes(args) -> int:
    from cnmnet_tpu.data.prep_planes import prepare_scene

    n = prepare_scene(args.scene_dir, num_workers=args.num_workers, limit=args.limit)
    print(f"wrote {n} frames")
    return 0


def cmd_prep_list(args) -> int:
    from cnmnet_tpu.data.prep import make_train_list

    n = make_train_list(
        args.root_dir,
        args.out,
        interval=args.interval,
        view_num=args.view_num,
        frame_stride=args.frame_stride,
    )
    print(f"wrote {n} samples to {args.out}")
    return 0


def cmd_report(args) -> int:
    from cnmnet_tpu.evals.html_report import write_comparison, write_report

    if args.compare:
        runs = [args.run_dir] + list(args.compare)
        out = os.path.join(args.run_dir, "comparison.html")
        write_comparison(out, runs, image_width=args.image_width)
        print(f"wrote {out}")
    else:
        pages = write_report(args.run_dir, image_width=args.image_width)
        print(f"wrote {len(pages)} sequence pages + index under {args.run_dir}")
    return 0


def cmd_export_tb(args) -> int:
    from cnmnet_tpu.obs.tb_export import convert_run

    convert_run(args.run_dir, args.out)
    return 0


def main(argv=None) -> int:
    args = _parse(argv if argv is not None else sys.argv[1:])
    return {
        "train": cmd_train,
        "eval": cmd_eval,
        "cal-metrics": cmd_cal_metrics,
        "eval-scannet": cmd_eval_scannet,
        "bench": cmd_bench,
        "infer": cmd_infer,
        "prep-cameras": cmd_prep_cameras,
        "prep-planes": cmd_prep_planes,
        "prep-list": cmd_prep_list,
        "export-tb": cmd_export_tb,
        "report": cmd_report,
    }[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
