#!/usr/bin/env python
"""Offline inspection of self-paced weight matrices.

Parity with reference semi_seg/weight_inspection.py:10-64: load a checkpoint,
run its projector over a contrastive batch, and dump the similarity matrix,
positive mask, and self-paced weight matrix for a range of gamma values as
npz (and optionally PNG heat maps).

    python weight_inspection.py Arch.checkpoint=runs/sp/pre/last.ckpt \
        Trainer.save_dir=runs/inspect [Data.synthetic=true]
"""
import sys
from pathlib import Path

import numpy as np

from spcl_tpu import CONFIG_PATH
from spcl_tpu.configure import ConfigManager
from spcl_tpu.utils import config_logger, fix_all_seed


def inspect(config, save_dir: str, gammas=(1.0, 3.0, 10.0, 100.0)):
    import jax
    import jax.numpy as jnp
    from spcl_tpu.data import create_contrastive_loader
    from spcl_tpu.data.augment import POLICY_ZOO, augment_twice
    from spcl_tpu.entry.common import load_datasets_from_config, build_model_from_config
    from spcl_tpu.hooks import create_hook_from_config
    from spcl_tpu.losses import self_paced_supcon_loss
    from spcl_tpu.entry import build_trainer

    trainer = build_trainer(config, save_dir=save_dir, pretrain=True)
    trainer.init()
    hooks = [h for h in trainer._hooks if h.feature_name]
    assert hooks, "config must activate an (sp)infonce hook"
    hook = hooks[0]

    batch = next(iter(trainer._contrastive_loader))
    policy = trainer.train_policy
    key = jax.random.PRNGKey(0)
    from spcl_tpu.training.steps import _as_float_image
    (v1, _), (v2, _) = augment_twice(key, _as_float_image(jnp.asarray(batch["image"])),
                                     None, policy, True)
    model = trainer._model
    variables = {"params": trainer.state.params["model"],
                 "batch_stats": trainer.state.batch_stats}
    acts = model.apply(variables, jnp.concatenate([v1, v2]), train=False,
                       until=hook.feature_name)
    z = hook._projector.apply(trainer.state.params["hooks"][hook.name],
                              acts[hook.feature_name])
    n = v1.shape[0]
    z1, z2 = z[:n], z[n:]
    target = jnp.asarray(batch["partition"])

    out = {}
    for gamma in gammas:
        loss, aux = self_paced_supcon_loss(
            z1, z2, gamma=gamma, target=target, valid=jnp.asarray(batch["valid"]),
            weight_update="soft", return_matrices=True)
        out[f"gamma_{gamma}"] = dict(
            loss=float(loss), downgrade_ratio=float(aux.downgrade_ratio),
            sim_logits=np.asarray(aux.sim_logits), pos_mask=np.asarray(aux.pos_mask),
            sp_mask=np.asarray(aux.sp_mask))
        print(f"gamma={gamma}: loss={float(loss):.4f} "
              f"kept_ratio={float(aux.downgrade_ratio):.4f}")

    Path(save_dir).mkdir(parents=True, exist_ok=True)
    np.savez_compressed(Path(save_dir) / "weight_inspection.npz",
                        **{f"{g}/{k}": v for g, d in out.items()
                           for k, v in d.items() if isinstance(v, np.ndarray)})
    return out


def main(argv=None):
    cm = ConfigManager(str(Path(CONFIG_PATH) / "base.yaml"),
                       str(Path(CONFIG_PATH) / "pretrain.yaml"),
                       strict=False).parse_args(argv)
    config = cm.merged_config
    save_dir = config.get("Trainer", {}).get("save_dir", "runs/inspect")
    config_logger(save_dir)
    fix_all_seed(int(config.get("RandomSeed", 10)))
    return inspect(config, save_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
