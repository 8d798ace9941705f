"""Subprocess worker for tests/test_multihost.py — NOT a test module.

Joins a jax.distributed CPU cluster (or runs single-process when --nprocs 1),
trains a tiny mesh pretrain and a tiny mesh finetune (with eval) on the
synthetic fixture, and prints one JSON line with the numbers the test
compares across processes and against the single-process oracle.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args()

    import jax
    from spcl_tpu.parallel import initialize_distributed
    if args.nprocs > 1:
        initialize_distributed(f"localhost:{args.port}", args.nprocs, args.pid)
    assert jax.device_count() == 8, jax.device_count()

    from spcl_tpu.entry import build_trainer
    from spcl_tpu.utils import fix_all_seed

    fix_all_seed(7)
    data = {"name": "acdc", "synthetic": True, "canvas": 48, "crop": 32,
            "synthetic_scans": 10, "synthetic_test_scans": 3,
            "labeled_scan_num": 4}
    arch = {"input_dim": 1, "num_classes": 4, "max_channel": 128,
            "dtype": "float32"}
    base = Path(args.outdir) / f"p{args.pid}"

    pre_cfg = {
        "RandomSeed": 7, "Arch": arch, "Data": dict(data),
        "Optim": {"name": "adam", "lr": 1e-3},
        "InfonceParams": {"feature_names": "Conv5", "weights": 1.0,
                          "contrast_ons": "partition", "temperature": 0.07},
        "ContrastiveLoaderParams": {"scan_sample_num": 8,
                                    "partition_sample_num": 1},
        "Trainer": {"name": "pretrain_encoder", "max_epoch": 2,
                    "num_batches": 4, "mesh": "auto",
                    "save_dir": str(base / "pre")},
    }
    tr = build_trainer(pre_cfg, save_dir=str(base / "pre"), pretrain=True)
    tr.init()
    tr.start_training()
    hist = tr._storage.history
    pre_loss = next(float(v) for k, v in hist[max(hist)].items()
                    if "reg_loss" in k)

    ft_cfg = {
        "RandomSeed": 7, "Arch": arch, "Data": dict(data),
        "Optim": {"name": "adam", "lr": 1e-3},
        "LabeledLoader": {"batch_size": 8},
        "Trainer": {"name": "finetune", "max_epoch": 2, "num_batches": 4,
                    "mesh": "auto", "save_dir": str(base / "ft")},
    }
    tr2 = build_trainer(ft_cfg, save_dir=str(base / "ft"))
    tr2.init()
    best = float(tr2.start_training())

    # host-streaming ingestion (device_data=False): batches (and eval
    # `valid` masks) are put as batch-sharded device arrays via
    # device_prefetch — the eval fetch must all_gather before device_get
    # on a multi-host mesh (trainer.py::_fetch)
    ft_stream = {
        "RandomSeed": 7, "Arch": arch, "Data": dict(data),
        "Optim": {"name": "adam", "lr": 1e-3},
        "LabeledLoader": {"batch_size": 8},
        "Trainer": {"name": "finetune", "max_epoch": 2, "num_batches": 4,
                    "mesh": "auto", "device_data": False,
                    "save_dir": str(base / "ft_stream")},
    }
    tr3 = build_trainer(ft_stream, save_dir=str(base / "ft_stream"))
    tr3.init()
    best_stream = float(tr3.start_training())

    print(json.dumps({
        "pid": args.pid,
        "process_count": jax.process_count(),
        "is_master": bool(tr._is_master),
        "pre_loss": pre_loss,
        "best_dice": best,
        "best_dice_stream": best_stream,
        "pre_ckpt": (base / "pre" / "last.ckpt").exists(),
        "ft_best_ckpt": (base / "ft" / "best.ckpt").exists(),
        "csv": (base / "ft" / "storage.csv").exists(),
    }), flush=True)


if __name__ == "__main__":
    main()
