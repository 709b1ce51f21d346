"""The reference's published two-stage training procedure, end-to-end.

`/root/reference/README.md:44-58` trains in two stages: first the
disparity-only recipe (`train.py train_wo_normal`), then the full CNM +
refinement recipe (`train.py train`) resumed from the stage-1 checkpoint.
This tool demonstrates that staging through OUR documented CLI entry on
synthetic data:

  stage 1: cli train --wo-normal --synthetic --max-steps N
  stage 2: cli train --synthetic --max-steps 2N  train.resume_dir=<stage1>

and then verifies, from the produced artifacts, that

  * stage 2 actually resumed (its global step continues past stage 1's),
  * the stage-1 learning carried over (stage 2's first logged loss is
    below stage 1's first logged loss — the warm start the reference's
    staging exists for),
  * every stage exit left a restorable checkpoint.

Usage: python tools/two_stage_recipe.py [--steps 6] [--workdir DIR]
Exit 0 iff all three checks hold; prints one evidence line per check.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_OVERRIDES = [
    "dataset.batch_size=2",
    "dataset.synthetic_size=8",
    "dataset.image_height=32",
    "dataset.image_width=64",
    "model.num_planes=8",
    "model.k_size=5",
    "train.num_epochs=1000",  # max-steps is the stop condition
]


def first_logged(log_dir: str, key: str) -> float:
    """First logged value of a metric. The warm-start check compares
    loss_idepth — the term BOTH recipes optimize (the total losses are not
    comparable across recipes: the full CNM loss adds depth/normal/prob
    terms the wo_normal curriculum gates out)."""
    with open(os.path.join(log_dir, "events.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("type") == "scalars" and key in rec:
                return float(rec[key])
    raise RuntimeError(f"no {key} events in {log_dir}")


def run_two_stage(workdir: str, steps: int) -> dict:
    from cnmnet_tpu.cli import main as cli_main
    from cnmnet_tpu.train.checkpoint import CheckpointManager

    stage1_ckpt = os.path.join(workdir, "stage1_ckpt")
    stage1_logs = os.path.join(workdir, "stage1_logs")
    stage2_ckpt = os.path.join(workdir, "stage2_ckpt")
    stage2_logs = os.path.join(workdir, "stage2_logs")

    rc = cli_main(
        ["train", "--wo-normal", "--synthetic", "--max-steps", str(steps)]
        + SMOKE_OVERRIDES
        + [f"train.checkpoint_dir={stage1_ckpt}", f"train.log_dir={stage1_logs}"]
    )
    assert rc == 0, "stage 1 failed"
    stage1_step = CheckpointManager(stage1_ckpt).latest_step()

    rc = cli_main(
        ["train", "--synthetic", "--max-steps", str(2 * steps)]
        + SMOKE_OVERRIDES
        + [
            f"train.resume_dir={stage1_ckpt}",
            f"train.checkpoint_dir={stage2_ckpt}",
            f"train.log_dir={stage2_logs}",
        ]
    )
    assert rc == 0, "stage 2 failed"
    stage2_step = CheckpointManager(stage2_ckpt).latest_step()

    return {
        "stage1_step": stage1_step,
        "stage2_step": stage2_step,
        "stage1_first_idepth": first_logged(stage1_logs, "loss_idepth"),
        "stage2_first_idepth": first_logged(stage2_logs, "loss_idepth"),
    }


def check(results: dict, steps: int) -> int:
    ok = True

    def line(cond, msg):
        nonlocal ok
        print(("PASS " if cond else "FAIL ") + msg)
        ok = ok and cond

    line(
        results["stage1_step"] == steps,
        f"stage 1 exit checkpoint at step {results['stage1_step']} == {steps}",
    )
    line(
        results["stage2_step"] == 2 * steps,
        f"stage 2 resumed and ran to step {results['stage2_step']} == {2 * steps}",
    )
    line(
        results["stage2_first_idepth"] < results["stage1_first_idepth"],
        "warm start carried over: stage-2 first loss_idepth "
        f"{results['stage2_first_idepth']:.4f} < stage-1 first "
        f"{results['stage1_first_idepth']:.4f}",
    )
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    workdir = args.workdir or tempfile.mkdtemp(prefix="two_stage_")
    print(f"workdir: {workdir}")
    results = run_two_stage(workdir, args.steps)
    return check(results, args.steps)


if __name__ == "__main__":
    raise SystemExit(main())
