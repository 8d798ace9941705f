"""Shared entry-point plumbing: config -> model/data/trainer.

Parity with the reference entry scaffolding (main.py:18-83, utils.py:7-34,
semi_seg/data/creator.py): trainer dispatch by `Trainer.name`, hook
activation by config-block presence, `pre_`/`ft_` config splitting for the
two-phase paper pipeline.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

from ..configure.dictionary_utils import (dictionary_merge_by_hierachy,
                                          extract_params_with_key_prefix)
from ..constants import DATASET_SPECS, data2class_numbers, data2input_dim
from ..data import SliceDataset, create_contrastive_loader, get_data, synthetic_dataset
from ..data.packing import (corrupt_meta_labels, load_packed,
                            synthetic_dataset_hard)
from ..hooks import create_hook_from_config, feature_until_from_hooks
from ..models import UNet
from ..models.masking import stages_from_range
from ..training import trainer_zoo
from ..utils.utils import get_logger

logger = get_logger("entry")


def separate_pretrain_finetune_configs(config: Dict) -> Tuple[Dict, Dict]:
    """Split one merged CLI config into (pretrain_config, finetune_config)
    via `pre_`/`ft_` key prefixes (reference utils.py:7-34)."""
    base = {k: v for k, v in config.items()}
    pre_overrides = extract_params_with_key_prefix(config, "pre_")
    ft_overrides = extract_params_with_key_prefix(config, "ft_")
    pretrain_config = dictionary_merge_by_hierachy(base, pre_overrides)
    finetune_config = dictionary_merge_by_hierachy(base, ft_overrides)
    return pretrain_config, finetune_config


def build_model_from_config(config: Dict) -> UNet:
    import jax.numpy as jnp
    arch = config.get("Arch", {})
    data_name = (config.get("Data") or {}).get("name", "acdc")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        str(arch.get("dtype", "float32"))]
    return UNet(
        input_dim=int(arch.get("input_dim", data2input_dim.get(data_name, 1))),
        num_classes=int(arch.get("num_classes", data2class_numbers.get(data_name, 4))),
        max_channel=int(arch.get("max_channel", 256)),
        momentum=float(arch.get("momentum", 0.1)),
        dtype=dtype,
        # stage-1/2 layout experiments (RESULTS.md round 3): nhwc is the
        # measured-fastest default; nchw/packed/pallas are kept selectable
        small_c_layout=str(arch.get("small_c_layout", "nhwc")))


_DATASET_CACHE: Dict = {}


def load_datasets_from_config(config: Dict) -> Tuple[SliceDataset, SliceDataset]:
    """Load (train, test) datasets — cached per Data config so sequential
    runs in one process (the finetune ratio sweep) share the same ROOT
    datasets, and therefore the same DeviceStore and compiled steps."""
    data = config.get("Data", {})
    name = data.get("name", "acdc")
    canvas = int(data.get("canvas", 256))
    synthetic = data.get("synthetic")
    meta_corrupt = float(data.get("meta_corrupt", 0) or 0)
    cache_key = (name, canvas, str(synthetic),
                 int(data.get("synthetic_scans", 20)),
                 int(data.get("synthetic_test_scans", 8)), data.get("root"),
                 meta_corrupt)
    if cache_key in _DATASET_CACHE:
        return _DATASET_CACHE[cache_key]
    if synthetic:
        # synthetic: true -> the easy blob fixture; "hard" -> the regime that
        # does not saturate from scratch at low labels (packing.py,
        # scripts/effect_study.py)
        gen = synthetic_dataset_hard if str(synthetic).lower() == "hard" \
            else synthetic_dataset
        tra = gen(name, num_scans=int(data.get("synthetic_scans", 20)),
                  canvas=canvas, seed=0)
        test = gen(name, num_scans=int(data.get("synthetic_test_scans", 8)),
                   canvas=canvas, seed=1, mode="val")
        if meta_corrupt:
            # fixed corruption seed: every arm sees the SAME noisy meta-labels
            tra = corrupt_meta_labels(tra, meta_corrupt, seed=777)
    else:
        root = data.get("root")
        if not root:
            raise RuntimeError("Data.root not set (packed .npz directory); "
                               "or set Data.synthetic=true")
        tra = load_packed(str(Path(root) / f"{name}_train.npz"))
        test = load_packed(str(Path(root) / f"{name}_val.npz"))
    _DATASET_CACHE[cache_key] = (tra, test)
    return tra, test


def build_trainer(config: Dict, *, save_dir: Optional[str] = None,
                  pretrain: bool = False):
    """Construct a fully wired (but not yet init'ed) trainer from a config."""
    from ..hooks.creator import LEGACY_TRAINER_PRESETS
    from ..parallel import initialize_distributed

    # multi-host wiring (no-op unless SPCL_COORDINATOR etc. are set); must
    # run before the first backend touch, hence before Trainer.__init__
    initialize_distributed()

    data_cfg = config.get("Data", {})
    trainer_cfg = config.get("Trainer", {})
    name = trainer_cfg.get("name") or ("pretrain" if pretrain else "semi")
    if name == "infoncepretrain":
        config = dictionary_merge_by_hierachy(
            LEGACY_TRAINER_PRESETS["infonce"], config)
        name = "pretrain"
        pretrain = True
    elif name in LEGACY_TRAINER_PRESETS:
        # legacy trainer zoo (reference semi_seg/trainers/__init__.py:5-23):
        # preset hook blocks under a SemiTrainer; explicit config blocks win
        config = dictionary_merge_by_hierachy(LEGACY_TRAINER_PRESETS[name], config)
        name = "semi"
    data_name = data_cfg.get("name", "acdc")
    # default crop follows the dataset's reference transforms (spleen trains
    # at 256, semi_seg/augment.py:103-137; everything else at 224)
    from ..data.augment import POLICY_ZOO
    default_crop = POLICY_ZOO.get(data_name, {"val": None})["val"]
    crop = int(data_cfg.get("crop", default_crop.crop if default_crop else 224))
    seed = int(config.get("RandomSeed", 10))

    tra_set, test_set = load_datasets_from_config(config)
    lab, unlab, val_loader, test_loader = get_data(
        tra_set=tra_set, test_set=test_set,
        labeled_scan_num=int(data_cfg.get("labeled_scan_num", 1)),
        labeled_batch_size=int((config.get("LabeledLoader") or {}).get("batch_size", 5)),
        unlabeled_batch_size=int((config.get("UnlabeledLoader") or {}).get("batch_size", 5)),
        pretrain=pretrain, seed=1,
        load_predefined_list=not bool(data_cfg.get("synthetic", False)))

    max_epoch = int(trainer_cfg.get("max_epoch", 75))
    hooks = create_hook_from_config(config, max_epoch=max_epoch)
    trainer_cls = trainer_zoo[name]

    kwargs = dict(model=build_model_from_config(config), labeled_loader=lab,
                  unlabeled_loader=unlab, val_loader=val_loader, test_loader=test_loader,
                  save_dir=save_dir or trainer_cfg.get("save_dir", "runs/tmp"),
                  max_epoch=max_epoch,
                  num_batches=int(trainer_cfg.get("num_batches", 100)),
                  config=config, seed=seed, crop=crop, data_name=data_name,
                  two_stage=bool(trainer_cfg.get("two_stage", False)),
                  disable_bn=bool(trainer_cfg.get("disable_bn", False)),
                  device_data=bool(trainer_cfg.get("device_data", True)),
                  defer_reads=bool(trainer_cfg.get("defer_reads", False)),
                  mesh=trainer_cfg.get("mesh", 0))

    if name.startswith("pretrain"):
        cl_cfg = config.get("ContrastiveLoaderParams", {})
        spec = DATASET_SPECS[data_name]
        contrastive_loader = create_contrastive_loader(
            tra_set, scan_sample_num=int(cl_cfg.get("scan_sample_num", 10)),
            partition_sample_num=int(cl_cfg.get("partition_sample_num", 1)),
            seed=seed, use_contrast_sampler=data_name == "acdc")
        until = feature_until_from_hooks(*hooks)
        kwargs.update(contrastive_loader=contrastive_loader, forward_until=until)
        trainer = trainer_cls(**kwargs)
        trainer.register_hooks(*hooks)
        if name == "pretrain_decoder":
            # decoder pretrain: encoder frozen at its pretrained weights,
            # decoder stages up to `until` trainable (reference
            # main_pretrain_decoder.py:42-76 set_grad(True, "Conv5", until))
            trainer.set_trainable_stages(stages_from_range("Conv5", until))
        else:
            trainer.set_trainable_stages(stages_from_range(None, until))
        logger.info("pretrain trainer %s: forward_until=%s", name, until)
        return trainer

    if name == "adv":
        kwargs.update(reg_weight=float(trainer_cfg.get("reg_weight", 0.01)),
                      dis_consider_image=bool(trainer_cfg.get("dis_consider_image", False)))
    trainer = trainer_cls(**kwargs)
    if trainer.activate_hooks:
        trainer.register_hooks(*hooks)
    return trainer
