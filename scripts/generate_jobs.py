#!/usr/bin/env python
"""Experiment grid generator.

Capability parity with the reference orchestration layer (script/utils.py:78-186
+ semi_seg/scripts/run_*): expand hyperparameter grids into shell command
lines for the entry points, one job per grid point, with the per-dataset
lr/epoch/batch zoos filled in. The SLURM submitter (`JobSubmiter` from
deepclustering2.cchelper) is replaced by plain stdout — pipe into xargs,
GNU parallel, or your scheduler of choice:

    python scripts/generate_jobs.py baseline --data acdc --seeds 10 20 30 | bash
    python scripts/generate_jobs.py spinfonce --data acdc \
        --grid begin_values=1000,10000 end_values=20,80 mode=soft,hard
"""
from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from spcl_tpu.constants import (data2class_numbers, data2input_dim, ft_lr_zooms,
                                ft_max_epoch_zoo, num_batches_zoo, pre_lr_zooms,
                                pre_max_epoch_zoo, ratio_zoo)


def grid_search(**kwargs):
    keys = list(kwargs)
    vals = [v if isinstance(v, (list, tuple)) else [v] for v in kwargs.values()]
    for combo in itertools.product(*vals):
        yield dict(zip(keys, combo))


def common_conditions(data: str) -> str:
    return (f"Data.name={data} Trainer.num_batches={num_batches_zoo.get(data, 200)} "
            f"Arch.input_dim={data2input_dim[data]} Arch.num_classes={data2class_numbers[data]}")


def param_string(params: dict) -> str:
    return "/".join(f"{k}_{v}" for k, v in params.items())


def baseline_jobs(args) -> list:
    jobs = []
    for seed in args.seeds:
        for scans in ratio_zoo[args.data]:
            save = f"{args.save_dir}/Seed_{seed}/baseline/tra_{scans:03d}"
            jobs.append(
                f"python main.py Trainer.name=ft Trainer.save_dir={save} "
                f"Optim.lr={ft_lr_zooms[args.data]:.7f} RandomSeed={seed} "
                f"Data.labeled_scan_num={scans} "
                f"Trainer.max_epoch={ft_max_epoch_zoo.get(args.data, 60)} "
                f"{common_conditions(args.data)}")
    return jobs


def pretrain_jobs(args, hook_yaml: str, extra_of=lambda p: "") -> list:
    jobs = []
    grid = dict(kv.split("=", 1) for kv in args.grid) if args.grid else {}
    grid = {k: v.split(",") for k, v in grid.items()}
    for seed in args.seeds:
        for params in grid_search(**grid) if grid else [{}]:
            save = f"{args.save_dir}/Seed_{seed}/{param_string(params) or 'default'}"
            extra = " ".join(f"SPInfonceParams.{k}={v}" for k, v in params.items())
            jobs.append(
                f"python main_pretrain_encoder.py Trainer.save_dir={save} "
                f"Optim.pre_lr={pre_lr_zooms[args.data]:.7f} "
                f"Optim.ft_lr={ft_lr_zooms[args.data]:.7f} RandomSeed={seed} "
                f"Trainer.pre_max_epoch={pre_max_epoch_zoo.get(args.data, 80)} "
                f"Trainer.ft_max_epoch={ft_max_epoch_zoo.get(args.data, 60)} "
                f"{common_conditions(args.data)} {extra} "
                f"--opt-path config/hooks/{hook_yaml}")
    return jobs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("flavor", choices=["baseline", "infonce", "spinfonce", "mixup", "adv",
                                      "semi_mt", "semi_consistency", "udaiic"])
    p.add_argument("--data", default="acdc")
    p.add_argument("--seeds", nargs="+", type=int, default=[10])
    p.add_argument("--save-dir", default="runs/grid")
    p.add_argument("--grid", nargs="*", default=[],
                   help="k=v1,v2 pairs expanded as a product (spinfonce params)")
    args = p.parse_args()

    if args.flavor == "baseline":
        jobs = baseline_jobs(args)
    elif args.flavor == "infonce":
        jobs = pretrain_jobs(args, "infonce.yaml")
    elif args.flavor == "spinfonce":
        jobs = pretrain_jobs(args, "spinfonce.yaml")
    elif args.flavor == "mixup":
        jobs = [f"python main_mixup.py Trainer.save_dir={args.save_dir}/Seed_{s}/mixup "
                f"RandomSeed={s} {common_conditions(args.data)}" for s in args.seeds]
    elif args.flavor == "adv":
        jobs = [f"python main_adv.py Trainer.save_dir={args.save_dir}/Seed_{s}/adv "
                f"RandomSeed={s} {common_conditions(args.data)}" for s in args.seeds]
    elif args.flavor == "semi_mt":
        jobs = [f"python main.py Trainer.name=semi Trainer.save_dir={args.save_dir}/Seed_{s}/mt "
                f"RandomSeed={s} {common_conditions(args.data)} "
                f"--opt-path config/hooks/mt.yaml" for s in args.seeds]
    elif args.flavor == "semi_consistency":
        jobs = [f"python main.py Trainer.name=semi Trainer.save_dir={args.save_dir}/Seed_{s}/cons "
                f"RandomSeed={s} {common_conditions(args.data)} "
                f"--opt-path config/hooks/consistency.yaml" for s in args.seeds]
    else:  # udaiic
        jobs = [f"python main.py Trainer.name=semi Trainer.save_dir={args.save_dir}/Seed_{s}/udaiic "
                f"RandomSeed={s} {common_conditions(args.data)} "
                f"--opt-path config/hooks/udaiic.yaml" for s in args.seeds]
    for j in jobs:
        print(j)


if __name__ == "__main__":
    main()
