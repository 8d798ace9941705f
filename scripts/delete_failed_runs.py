#!/usr/bin/env python
"""Remove run directories without a `.success` marker.

Parity with reference semi_seg/scripts/delete_failed_runs.py (consumes the
marker written by spcl_tpu.success on completion).
"""
import argparse
import shutil
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("root", help="runs directory to scan")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    for run_dir in sorted(Path(args.root).rglob("config.yaml")):
        d = run_dir.parent
        if not (d / ".success").exists():
            print(f"{'would delete' if args.dry_run else 'deleting'} {d}")
            if not args.dry_run:
                shutil.rmtree(d)


if __name__ == "__main__":
    main()
