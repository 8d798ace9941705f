#!/usr/bin/env python
"""End-to-end pipeline demonstration on the synthetic dataset (real TPU).

Runs the paper's two-phase recipe at reduced scale and compares fine-tuning
from the self-paced contrastive pretrained encoder vs from scratch at a low
labeled ratio. Writes runs/demo/summary.md. (The real ACDC data is gdrive-hosted and
this environment has no egress; the synthetic fixture preserves the
scan/partition/cycle structure.)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import main as main_entry
from spcl_tpu.entry import build_trainer
from spcl_tpu.utils import config_logger, fix_all_seed

OUT = Path(__file__).parents[1] / "runs" / "demo" / "summary.md"

BASE = {
    "RandomSeed": 10,
    "Arch": {"input_dim": 1, "num_classes": 4, "checkpoint": None,
             "max_channel": 256, "momentum": 0.1},
    "Optim": {"name": "adam", "lr": 5e-4, "weight_decay": 1e-5},
    "Scheduler": {"multiplier": 1, "warmup_max": 2},
    "Data": {"name": "acdc", "labeled_scan_num": 2, "canvas": 256, "crop": 224,
             "synthetic": True, "synthetic_scans": 24, "synthetic_test_scans": 8},
    "LabeledLoader": {"batch_size": 5},
    "UnlabeledLoader": {"batch_size": 5},
    "Trainer": {"save_dir": "runs/demo", "num_batches": 60, "max_epoch": 8,
                "two_stage": False, "disable_bn": False, "name": None,
                # round-4 production eval geometry: identical per-scan dice,
                # 4.4x per-slice eval throughput + 7x fewer dispatches
                "packed_eval": 96},
    "ContrastiveLoaderParams": {"scan_sample_num": 10, "partition_sample_num": 1},
}


def run(name, config, pretrain=False, save_dir=None):
    import copy
    cfg = copy.deepcopy(config)
    cfg["Trainer"]["save_dir"] = save_dir or f"runs/demo/{name}"
    t0 = time.time()
    trainer = build_trainer(cfg, save_dir=cfg["Trainer"]["save_dir"], pretrain=pretrain)
    trainer.init()
    best = trainer.start_training()
    return best, time.time() - t0, trainer


def main():
    fix_all_seed(10)
    config_logger("runs/demo")
    results = {}

    # 1) finetune from scratch at 2 labeled scans
    import copy
    ft_cfg = copy.deepcopy(BASE)
    ft_cfg["Trainer"]["name"] = "ft"
    best, dt, _ = run("scratch_ft", ft_cfg)
    results["finetune_from_scratch"] = {"best_val_dsc": round(best, 4), "seconds": round(dt, 1)}
    print("scratch:", results["finetune_from_scratch"], flush=True)

    # 2) self-paced contrastive encoder pretrain
    pre_cfg = copy.deepcopy(BASE)
    pre_cfg["Trainer"]["name"] = "pretrain_encoder"
    pre_cfg["Trainer"]["max_epoch"] = 10
    pre_cfg["Optim"]["lr"] = 1e-4
    pre_cfg["SPInfonceParams"] = {"feature_names": "Conv5", "weights": 1.0,
                                  "contrast_ons": "partition", "begin_values": 1000,
                                  "end_values": 20, "mode": "soft", "p": 0.5,
                                  "correct_grad": True}
    _, dt_pre, pre_trainer = run("pretrain", pre_cfg, pretrain=True)
    results["pretrain"] = {"seconds": round(dt_pre, 1)}
    print("pretrain:", results["pretrain"], flush=True)

    # 3) finetune from the pretrained encoder
    ft2_cfg = copy.deepcopy(ft_cfg)
    ft2_cfg["Arch"]["checkpoint"] = str(Path("runs/demo/pretrain") / "last.ckpt")
    best2, dt2, _ = run("pretrained_ft", ft2_cfg)
    results["finetune_from_pretrained"] = {"best_val_dsc": round(best2, 4),
                                           "seconds": round(dt2, 1)}
    print("pretrained:", results["finetune_from_pretrained"], flush=True)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(f"""# Demo summary — end-to-end pipeline (synthetic, one TPU v5e chip)

The paper recipe at reduced scale on the synthetic fixture (real ACDC is
gdrive-hosted; this environment has no egress). Workload shapes match the
reference: 224x224 crops from a 256 canvas, UNet max_channel=256,
contrastive batch = 10 scans x 3 partitions, 2 labeled scans for finetune.

| stage | epochs x batches | best val DSC | wall-clock |
|---|---|---|---|
| finetune from scratch (2 labeled scans) | {ft_cfg['Trainer']['max_epoch']} x {ft_cfg['Trainer']['num_batches']} | {results['finetune_from_scratch']['best_val_dsc']} | {results['finetune_from_scratch']['seconds']}s |
| SP-InfoNCE encoder pretrain | {pre_cfg['Trainer']['max_epoch']} x {pre_cfg['Trainer']['num_batches']} | — | {results['pretrain']['seconds']}s |
| finetune from pretrained encoder | {ft2_cfg['Trainer']['max_epoch']} x {ft2_cfg['Trainer']['num_batches']} | {results['finetune_from_pretrained']['best_val_dsc']} | {results['finetune_from_pretrained']['seconds']}s |

Raw: `{json.dumps(results)}`

Notes:
- The synthetic task saturates from scratch (blobs are easy), so pretraining
  shows no Dice advantage here — this run demonstrates the PIPELINE
  (pretrain -> partial warm start -> finetune -> per-scan eval ->
  best/last checkpoints) on real TPU hardware, not the paper's low-label
  effect, which needs the real ACDC data (gdrive-hosted; unavailable in
  this zero-egress environment).
- Wall-clock includes one-time XLA compilation through this environment's
  remote-compile relay; later phases reuse compiled steps via the
  in-process step cache.
- Datasets are device-resident (DeviceStore): batches are gathered in HBM
  by index, so the per-step host->device traffic is one index vector.
- Per-epoch steady-state throughput is recorded in each run's storage.csv
  (tra/throughput/slices_per_sec); bench.py reports the pure-step rate.
""")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
