#!/usr/bin/env python
"""The paper's end-to-end pipeline: encoder pretrain -> fine-tune sweep.

Reference-parity CLI (reference main_pretrain_encoder.py:21-74): one merged
config is split into a pretrain config (keys prefixed `pre_`) and a finetune
config (keys prefixed `ft_`); the encoder is pretrained with the (self-paced)
InfoNCE hooks to Conv5, then `val` fine-tunes at every labeled ratio.
"""
import sys
from pathlib import Path

from spcl_tpu import CONFIG_PATH
from spcl_tpu.configure import ConfigManager
from spcl_tpu.entry import build_trainer, separate_pretrain_finetune_configs, val
from spcl_tpu.utils import config_logger, fix_all_seed


def main(argv=None, *, until_check: str = "Conv5"):
    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"),
                       str(Path(CONFIG_PATH) / "pretrain.yaml"),
                       strict=False).parse_args(argv)
    config = cm.merged_config
    pretrain_config, ft_config = separate_pretrain_finetune_configs(config)
    save_dir = config.get("Trainer", {}).get("save_dir", "runs/pretrain_encoder")
    config_logger(save_dir)
    fix_all_seed(int(config.get("RandomSeed", 10)))

    pretrain_config.setdefault("Trainer", {})["name"] = "pretrain_encoder"
    trainer = build_trainer(pretrain_config, save_dir=str(Path(save_dir) / "pre"),
                            pretrain=True)
    if until_check:
        assert trainer._forward_until == until_check, \
            (trainer._forward_until, until_check)  # reference :65-67 assert
    trainer.init()
    trainer.start_training()

    ckpt = str(Path(save_dir) / "pre" / "last.ckpt")
    return val(base_config=ft_config, pretrained_checkpoint=ckpt, save_dir=save_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
