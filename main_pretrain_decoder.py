#!/usr/bin/env python
"""Decoder pretrain -> fine-tune sweep (reference main_pretrain_decoder.py:42-76):
encoder frozen at its (optionally pre-pretrained) weights, decoder stages up
to the deepest hook stage trainable; views share geometry (total_freedom=False)
so dense positions align."""
import sys
from pathlib import Path

from spcl_tpu import CONFIG_PATH
from spcl_tpu.configure import ConfigManager
from spcl_tpu.entry import build_trainer, separate_pretrain_finetune_configs, val
from spcl_tpu.utils import config_logger, fix_all_seed


def main(argv=None):
    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"),
                       str(Path(CONFIG_PATH) / "pretrain.yaml"),
                       strict=False).parse_args(argv)
    config = cm.merged_config
    pretrain_config, ft_config = separate_pretrain_finetune_configs(config)
    save_dir = config.get("Trainer", {}).get("save_dir", "runs/pretrain_decoder")
    config_logger(save_dir)
    fix_all_seed(int(config.get("RandomSeed", 10)))

    pretrain_config.setdefault("Trainer", {})["name"] = "pretrain_decoder"
    trainer = build_trainer(pretrain_config, save_dir=str(Path(save_dir) / "pre"),
                            pretrain=True)
    trainer.init()
    trainer.start_training()

    ckpt = str(Path(save_dir) / "pre" / "last.ckpt")
    return val(base_config=ft_config, pretrained_checkpoint=ckpt, save_dir=save_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
