#!/usr/bin/env python
"""Full reference-schedule wall-clock run (synthetic data, one TPU v5e chip).

Runs the paper's COMPLETE pinned workload (BASELINE.md): 80 epochs x 200
batches of self-paced contrastive encoder pretraining, then the finetune
sweep (60 epochs x 200 batches per labeled ratio) with per-epoch val+test
evaluation and best checkpointing.

Each phase runs in its OWN process with the zero-read training mode
(Trainer.defer_reads). Appends the timing table to RESULTS.md.

NOTE (this environment): the device tunnel charges ~0.2s per executed step
at the first device->host read (journal validation) — the full 52,000-step
schedule takes ~3h through the tunnel. True device cost at the round-2
profiled step times (23.4 ms f32): ~20 min for the whole schedule; on a
real TPU host this script's wall-clock approaches that.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parents[1]
OUT = REPO / "RESULTS.md"

COMMON = [
    "RandomSeed=10",
    "Arch.max_channel=256", "Arch.num_classes=4", "Arch.input_dim=1",
    "Data.synthetic=true", "Data.canvas=256", "Data.crop=224",
    "Data.synthetic_scans=24", "Data.synthetic_test_scans=8",
    "LabeledLoader.batch_size=5", "UnlabeledLoader.batch_size=5",
    "Trainer.num_batches=200", "Trainer.defer_reads=true",
    "Scheduler.multiplier=300", "Scheduler.warmup_max=10",
]


def run_phase(tag, args):
    t0 = time.time()
    proc = subprocess.run([sys.executable, "main.py"] + args, cwd=str(REPO),
                          capture_output=True, text=True)
    dt = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-3000:], flush=True)
        raise RuntimeError(f"phase {tag} failed")
    print(f"{tag}: {dt:.0f}s", flush=True)
    return dt


def best_score(run_dir):
    import pandas as pd
    df = pd.read_csv(REPO / run_dir / "storage.csv")
    return float(df["val/dice/DSC_mean"].max())


def main():
    t_all = time.time()
    t_pre = run_phase("pretrain", COMMON + [
        "Trainer.name=pretrain_encoder", "Trainer.max_epoch=80",
        "Trainer.save_dir=runs/full/pre", "Optim.lr=5e-7",
        "ContrastiveLoaderParams.scan_sample_num=10",
        "--opt-path", "config/hooks/spinfonce.yaml",
    ])

    ratios = [1, 2, 4]
    t_fts, scores = [], {}
    for r in ratios:
        t_fts.append(run_phase(f"ft_{r}", COMMON + [
            "Trainer.name=ft", "Trainer.max_epoch=60",
            f"Trainer.save_dir=runs/full/tra_{r}", "Optim.lr=2e-7",
            f"Data.labeled_scan_num={r}",
            "Arch.checkpoint=runs/full/pre/last.ckpt",
        ]))
        scores[r] = best_score(f"runs/full/tra_{r}")
    total = time.time() - t_all

    with open(OUT, "a") as f:
        f.write(f"""

## Full reference schedule (pinned workload, BASELINE.md), one TPU v5e chip

Zero-read training mode, one process per phase (each pays its own XLA
compile — several minutes through this environment's compile relay — then
runs the whole phase without a single device->host read).

| phase | schedule | wall-clock |
|---|---|---|
| SP-InfoNCE encoder pretrain | 80 x 200 batches (30 slices, 2 views) = 16,000 steps | {t_pre:.0f}s |
| finetune ratio sweep {ratios} | 3 x (60 x 200 steps + 120 eval epochs) = 36,000 steps | {sum(t_fts):.0f}s ({', '.join(f'{t:.0f}s' for t in t_fts)}) |
| **total pipeline** | 52,000 train steps + evals + checkpoints | **{total/60:.1f} min** |

Best val DSC per ratio: `{json.dumps({k: round(v, 4) for k, v in scores.items()})}`
(synthetic data — schedule, shapes and step counts are the reference's; the
reference needs many GPU-hours for the same workload.)
""")
    print(f"TOTAL {total/60:.1f} min; scores {scores}", flush=True)


if __name__ == "__main__":
    main()
