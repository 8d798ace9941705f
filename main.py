#!/usr/bin/env python
"""Single-stage run: trainer in {semi, ft, mixup, adv, pretrain}.

Reference-parity CLI (reference main.py:18-83):
    python main.py Trainer.name=semi Data.labeled_scan_num=4 \
        --opt-path config/hooks/spinfonce.yaml [Key.Sub=value ...]
"""
import sys
from pathlib import Path

from spcl_tpu import CONFIG_PATH
from spcl_tpu.configure import ConfigManager
from spcl_tpu.entry import build_trainer
from spcl_tpu.utils import config_logger, fix_all_seed


def main(argv=None):
    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"), strict=False).parse_args(argv)
    config = cm.merged_config
    save_dir = config.get("Trainer", {}).get("save_dir", "runs/tmp")
    config_logger(save_dir)
    fix_all_seed(int(config.get("RandomSeed", 10)))
    pretrain = str(config.get("Trainer", {}).get("name", "")).startswith("pretrain")
    trainer = build_trainer(config, save_dir=save_dir, pretrain=pretrain)
    trainer.init()
    ckpt = config.get("trainer_checkpoint")
    if ckpt:
        trainer.resume_from_path(ckpt)
    return trainer.start_training()


if __name__ == "__main__":
    main(sys.argv[1:])
