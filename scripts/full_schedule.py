#!/usr/bin/env python
"""Full reference-schedule wall-clock run (synthetic data, one TPU v5e chip).

Runs the paper's COMPLETE pinned workload (BASELINE.md): 80 epochs x 200
batches of self-paced contrastive encoder pretraining (10 scans x 3
partitions per batch), then the finetune sweep (60 epochs x 200 batches per
labeled ratio) with per-epoch val+test evaluation and best/last
checkpointing. Appends the timing table to RESULTS.md.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from spcl_tpu.entry import build_trainer, val
from spcl_tpu.utils import config_logger, fix_all_seed

OUT = Path(__file__).parents[1] / "RESULTS.md"

BASE = {
    "RandomSeed": 10,
    "Arch": {"input_dim": 1, "num_classes": 4, "checkpoint": None,
             "max_channel": 256, "momentum": 0.1},
    "Optim": {"name": "RAdam", "lr": 5e-7, "weight_decay": 1e-5},
    "Scheduler": {"multiplier": 300, "warmup_max": 10},
    "Data": {"name": "acdc", "labeled_scan_num": 1, "canvas": 256, "crop": 224,
             "synthetic": True, "synthetic_scans": 24, "synthetic_test_scans": 8,
             "ratios": [1, 2, 4]},
    "LabeledLoader": {"batch_size": 5},
    "UnlabeledLoader": {"batch_size": 5},
    "Trainer": {"save_dir": "runs/full", "num_batches": 200, "max_epoch": 80,
                "save_every": 10, "name": None},
    "ContrastiveLoaderParams": {"scan_sample_num": 10, "partition_sample_num": 1},
    "SPInfonceParams": {"feature_names": "Conv5", "weights": 1.0,
                        "contrast_ons": "partition", "begin_values": 10000,
                        "end_values": 20, "mode": "soft", "p": 0.5,
                        "correct_grad": True},
}


def main():
    import copy
    fix_all_seed(10)
    config_logger("runs/full")

    t_all = time.time()
    pre_cfg = copy.deepcopy(BASE)
    pre_cfg["Trainer"]["name"] = "pretrain_encoder"
    t0 = time.time()
    trainer = build_trainer(pre_cfg, save_dir="runs/full/pre", pretrain=True)
    trainer.init()
    trainer.start_training()
    t_pre = time.time() - t0
    print(f"pretrain done in {t_pre:.0f}s", flush=True)

    ft_cfg = copy.deepcopy(BASE)
    del ft_cfg["SPInfonceParams"]
    ft_cfg["Trainer"]["max_epoch"] = 60
    ft_cfg["Optim"]["lr"] = 2e-7
    t0 = time.time()
    results = val(base_config=ft_cfg, pretrained_checkpoint="runs/full/pre/last.ckpt",
                  save_dir="runs/full")
    t_ft = time.time() - t0
    total = time.time() - t_all

    with open(OUT, "a") as f:
        f.write(f"""

## Full reference schedule (pinned workload, BASELINE.md), one TPU v5e chip

| phase | schedule | wall-clock |
|---|---|---|
| SP-InfoNCE encoder pretrain | 80 epochs x 200 batches (30 slices, 2 views) | {t_pre:.0f}s |
| finetune sweep, ratios {list(results)} | 60 epochs x 200 batches each + per-epoch val/test eval | {t_ft:.0f}s |
| **total pipeline** | | **{total/60:.1f} min** |

Best val DSC per ratio: `{json.dumps({k: round(v, 4) for k, v in results.items()})}`
(synthetic data — the schedule, shapes and step counts are the reference's;
the reference runs this workload in many GPU-hours.)
""")
    print(f"TOTAL {total/60:.1f} min; results {results}", flush=True)


if __name__ == "__main__":
    main()
