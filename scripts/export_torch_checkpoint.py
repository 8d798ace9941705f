#!/usr/bin/env python
"""Export an spcl_tpu checkpoint to a reference-loadable torch ``.pth``.

Inverse of scripts/import_torch_checkpoint.py: weights trained here go back
into the reference ecosystem (its UNet, its val sweep, torch tooling). The
default output is a ``{"_model": state_dict}`` dict — the shape the
reference's trainer checkpoints carry the model under
(/root/reference/contrastyou/utils/utils.py:100-103) — so the file drops
into any reference code path that does ``extract_model_state_dict``;
``--raw`` writes the bare ``UNet.state_dict()`` instead.

Accepts anything the Trainer writes: full trainer checkpoints
(best.ckpt/last.ckpt) and model-only warm starts. Encoder-only pretrain
checkpoints export the blocks they have (torch side: ``strict=False``, the
same tolerance the reference's own warm start relies on).

Usage:
    python scripts/export_torch_checkpoint.py runs/ft/best.ckpt out.pth
    python scripts/export_torch_checkpoint.py runs/pre/last.ckpt out.pth --raw
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="spcl_tpu checkpoint (trainer ckpt or warm start)")
    ap.add_argument("dst", help="output torch .pth")
    ap.add_argument("--raw", action="store_true",
                    help="write the bare state_dict (default: under '_model')")
    args = ap.parse_args(argv)

    import torch

    from spcl_tpu.models.torch_import import (read_model_tree,
                                              torch_state_dict_from_flax)

    params, stats = read_model_tree(args.src)
    sd_np = torch_state_dict_from_flax(params, stats, allow_partial=True)
    sd = {k: torch.from_numpy(v.copy()) if v.ndim else torch.tensor(v)
          for k, v in sd_np.items()}
    torch.save(sd if args.raw else {"_model": sd}, args.dst)
    full = not any(k not in params for k in
                   ("Conv1", "Up_conv2", "Deconv_1x1"))
    n = sum(int(v.numel()) for v in sd.values())
    print(f"wrote {args.dst}: {len(sd)} tensors / {n} elements "
          f"({'full model' if full else 'PARTIAL — torch side needs strict=False'})")


if __name__ == "__main__":
    main()
