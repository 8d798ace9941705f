#!/usr/bin/env python
"""Inference + full evaluation from a checkpoint.

Capability parity with reference val-time evaluation + prediction dumping
(semi_seg/epochers/helper.py:68-98 write_predict/write_img_target; the
reference's semi_seg/inference.py is bit-rotted — SURVEY.md §0): per-scan 3D
Dice, HD95 and ASSD surface metrics, optional PNG dumps of predictions.

    python inference.py Arch.checkpoint=runs/sp/pre/last.ckpt \
        Trainer.save_dir=runs/inference [Data.synthetic=true]
"""
import sys
from pathlib import Path

import numpy as np

from spcl_tpu import CONFIG_PATH
from spcl_tpu.configure import ConfigManager
from spcl_tpu.entry import build_trainer
from spcl_tpu.meters import SurfaceMeter, UniversalDice
from spcl_tpu.utils import config_logger, fix_all_seed


def run_inference(config, save_dir: str, dump_png: bool = False):
    import jax
    import jax.numpy as jnp
    from spcl_tpu.data.augment import center_crop

    trainer = build_trainer(config, save_dir=save_dir)
    trainer.init()
    ckpt = (config.get("Arch") or {}).get("checkpoint")
    # build_trainer already warm-started from Arch.checkpoint via init()

    model = trainer._model
    C = model.num_classes
    dice = UniversalDice(C, report_axises=list(range(1, C)))
    hd95 = SurfaceMeter(C, report_axises=list(range(1, C)), metername="hausdorff95")
    assd = SurfaceMeter(C, report_axises=list(range(1, C)), metername="average_surface")

    loader = trainer._test_loader or trainer._val_loader
    sampler = loader.sampler
    pred_dir = Path(save_dir) / "pred"
    out_size = trainer._eval_out_size()
    shortest_side = isinstance(trainer.val_policy.resize, int)
    for i, batch in enumerate(loader):
        from spcl_tpu.training.steps import _as_float_image, _as_int_label
        from spcl_tpu.data.augment import center_geometric, frame_pixel_mask
        sizes = jnp.asarray(batch["size"]) if "size" in batch else None
        img, lab = center_crop(_as_float_image(jnp.asarray(batch["image"])),
                               _as_int_label(jnp.asarray(batch["label"])),
                               trainer._crop, sizes=sizes,
                               policy=trainer.val_policy, out_size=out_size)
        acts = model.apply({"params": trainer.state.params["model"],
                            "batch_stats": trainer.state.batch_stats}, img, train=False)
        pred = np.asarray(jnp.argmax(acts["logits"], axis=-1))
        if shortest_side:
            # frame-pixel masking (non-square shortest-side val resize):
            # padding pixels never exist in the reference's val geometry
            geo = center_geometric(img.shape[0], trainer.val_policy,
                                   batch["image"].shape[1], sizes, out_size)
            pred = pred * np.asarray(frame_pixel_mask(geo, out_size)).astype(pred.dtype)
        lab_np = np.asarray(lab)
        keep = np.asarray(batch["valid"]).astype(bool)
        scan = sampler.scan_of_batch(i)
        dice.add_labels(pred[keep], lab_np[keep], group_name=scan)
        hd95.add(pred[keep], lab_np[keep], group_name=scan)
        assd.add(pred[keep], lab_np[keep], group_name=scan)
        if dump_png:
            from PIL import Image
            pred_dir.mkdir(parents=True, exist_ok=True)
            for k, ok in enumerate(keep):
                if ok:
                    Image.fromarray(pred[k].astype(np.uint8)).save(
                        pred_dir / f"{scan}_{k:03d}.png")

    report = {**dice.summary(), **hd95.summary(), **assd.summary()}
    print({k: round(float(v), 4) for k, v in report.items()})
    return report


def main(argv=None):
    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"), strict=False).parse_args(argv)
    config = cm.merged_config
    save_dir = config.get("Trainer", {}).get("save_dir", "runs/inference")
    config_logger(save_dir)
    fix_all_seed(int(config.get("RandomSeed", 10)))
    return run_inference(config, save_dir,
                         dump_png=bool(config.get("Trainer", {}).get("dump_png", False)))


if __name__ == "__main__":
    main(sys.argv[1:])
