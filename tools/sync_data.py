"""Dataset transfer housekeeping (counterpart of `scannet/upload_data.py` /
`scannet/rm_data.py` — the reference's scp/rm loops, SURVEY.md §2.21).

Usage:
  python tools/sync_data.py upload --root /data/scannet --dest host:/data \
      --scenes scene0000_00 scene0001_00
  python tools/sync_data.py clean --root /data/scannet --subdirs rgb depth \
      --scenes scene0000_00 --dry-run
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def upload(args) -> int:
    for scene in args.scenes:
        src = os.path.join(args.root, scene)
        cmd = ["rsync", "-a", src, args.dest] if shutil.which("rsync") else [
            "scp", "-r", src, args.dest
        ]
        print(" ".join(cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=True)
    return 0


def clean(args) -> int:
    for scene in args.scenes:
        for sub in args.subdirs:
            path = os.path.join(args.root, scene, sub)
            if not os.path.isdir(path):
                continue
            print(f"rm -r {path}")
            if not args.dry_run:
                shutil.rmtree(path)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="command", required=True)
    up = sub.add_parser("upload")
    up.add_argument("--root", required=True)
    up.add_argument("--dest", required=True)
    up.add_argument("--scenes", nargs="+", required=True)
    up.add_argument("--dry-run", action="store_true")
    cl = sub.add_parser("clean")
    cl.add_argument("--root", required=True)
    cl.add_argument("--subdirs", nargs="+", required=True)
    cl.add_argument("--scenes", nargs="+", required=True)
    cl.add_argument("--dry-run", action="store_true")
    args = p.parse_args(argv)
    return {"upload": upload, "clean": clean}[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
