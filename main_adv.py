#!/usr/bin/env python
"""Adversarial semi-supervised baseline (reference main_adv.py:16-52)."""
import sys
from pathlib import Path

from spcl_tpu import CONFIG_PATH
from spcl_tpu.configure import ConfigManager
from spcl_tpu.entry import build_trainer
from spcl_tpu.utils import config_logger, fix_all_seed


def main(argv=None):
    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"),
                       str(Path(CONFIG_PATH) / "hooks" / "adv.yaml"),
                       strict=False).parse_args(argv)
    config = cm.merged_config
    config.setdefault("Trainer", {})["name"] = "adv"
    save_dir = config["Trainer"].get("save_dir", "runs/adv")
    config_logger(save_dir)
    fix_all_seed(int(config.get("RandomSeed", 10)))
    trainer = build_trainer(config, save_dir=save_dir)
    trainer.init()
    return trainer.start_training()


if __name__ == "__main__":
    main(sys.argv[1:])
