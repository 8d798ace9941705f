#!/usr/bin/env python
"""Import a reference torch checkpoint into a Trainer-loadable warm start.

The reference's published ``.pth`` trainer checkpoints keep the UNet under
the ``"_model"`` key (/root/reference/contrastyou/utils/utils.py:100-103);
raw ``UNet.state_dict()`` files are also accepted. The output file feeds
``Trainer(init_model_checkpoint=...)`` / ``load_model_params`` — the same
model-only warm start the reference uses to hand pretrain weights to
finetune.

Usage:
    python scripts/import_torch_checkpoint.py in.pth out.ckpt
    python scripts/import_torch_checkpoint.py in.pth out.ckpt --key _model
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="torch .pth (trainer checkpoint or raw state_dict)")
    ap.add_argument("dst", help="output warm-start checkpoint")
    ap.add_argument("--key", default=None,
                    help="dict key holding the model state_dict "
                         "(default: auto — use '_model' if present)")
    args = ap.parse_args(argv)

    import torch

    from spcl_tpu.models.torch_import import (flax_from_torch_state_dict,
                                              write_warm_start)

    blob = torch.load(args.src, map_location="cpu")
    if args.key is not None:
        sd = blob[args.key]
    elif isinstance(blob, dict) and "_model" in blob:
        sd = blob["_model"]
    else:
        sd = blob
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, stats = flax_from_torch_state_dict(sd)
    write_warm_start(args.dst, params, stats)
    n = sum(v.size for v in _leaves(params))
    ns = sum(v.size for v in _leaves(stats))
    print(f"wrote {args.dst}: {n} params + {ns} batch-stat values "
          f"imported from {args.src}")


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
