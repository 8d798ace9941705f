#!/usr/bin/env python
"""Pack a reference-layout PNG dataset into the .npz files the entries load.

The reference trains straight off folder-of-PNG trees, decoding every slice
in DataLoader workers each step (contrastyou/data/dataset/base.py:59-227).
This framework pays the decode once: run this script on a downloaded /
unzipped reference dataset directory, then point the entries at the output:

    python scripts/pack_dataset.py --root .data/ACDC_contrast --name acdc \
        --out .data/packed
    python main.py trainer=ft Data.name=acdc Data.root=.data/packed ...

Expected input layout (reference _ioutils.py unzip result):
    <root>/train/img/*.png   <root>/train/gt/*.png
    <root>/val/img/*.png     <root>/val/gt/*.png
mmWHS multi-modal: pass --image-folders img t2 (one channel per folder,
reference semi_seg/epochers/helper.py:33-36).

Original slice extents are recorded per slice (SliceDataset.sizes) so the
on-device Resize policies (prostate/spleen) reproduce the reference
geometry; pick --canvas at least the largest slice dimension to avoid any
cropping at pack time.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from spcl_tpu.constants import DATASET_SPECS
from spcl_tpu.data.packing import pack_png_folder


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--root", required=True, help="dataset dir with train/ and val/")
    ap.add_argument("--name", required=True, choices=sorted(DATASET_SPECS),
                    help="dataset key (drives scan regex / partition rules)")
    ap.add_argument("--out", required=True, help="output directory for the .npz files")
    ap.add_argument("--canvas", type=int, default=256,
                    help="square canvas size; slices are centered, zero-padded "
                         "(>= largest slice dim to avoid cropping)")
    ap.add_argument("--modes", nargs="+", default=["train", "val"])
    ap.add_argument("--image-folders", nargs="+", default=["img"],
                    help=">1 folder packs a multi-modal dataset (mmWHS)")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for mode in args.modes:
        path = out / f"{args.name}_{mode}.npz"
        ds = pack_png_folder(args.root, args.name, mode=mode, canvas=args.canvas,
                             save_path=str(path),
                             image_folders=tuple(args.image_folders))
        print(f"{mode}: {len(ds)} slices, {len(ds.unique_scans)} scans, "
              f"canvas {args.canvas} -> {path} "
              f"({path.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
