#!/usr/bin/env python
"""Fine-tune sweep CLI (reference val.py:24-66).

    python val.py Arch.checkpoint=runs/pre/last.ckpt Trainer.save_dir=runs/sweep
"""
import sys
from pathlib import Path

from spcl_tpu import CONFIG_PATH
from spcl_tpu.configure import ConfigManager
from spcl_tpu.entry import val as val_sweep
from spcl_tpu.utils import config_logger, fix_all_seed


def main(argv=None):
    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"), strict=False).parse_args(argv)
    config = cm.merged_config
    save_dir = config.get("Trainer", {}).get("save_dir", "runs/val_sweep")
    config_logger(save_dir)
    fix_all_seed(int(config.get("RandomSeed", 10)))
    ckpt = (config.get("Arch") or {}).get("checkpoint")
    if not ckpt:
        raise SystemExit("set Arch.checkpoint=<pretrained .ckpt>")
    config["Arch"]["checkpoint"] = None  # val() re-injects per ratio
    results = val_sweep(base_config=config, pretrained_checkpoint=ckpt, save_dir=save_dir)
    print(results)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
