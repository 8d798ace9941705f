import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.data import (
    ContrastBatchSampler, HostLoader, InfiniteRandomSampler, ScanBatchSampler,
    compute_partition, create_contrastive_loader, extract_sub_dataset_based_on_scan_names,
    get_data, split_dataset, split_dataset_with_predefined_filenames, synthetic_dataset,
)
from spcl_tpu.data.augment import (
    ACDC_PRETRAIN, AugmentPolicy, apply_flip, augment_once, augment_twice,
    center_crop, flip_params,
)


@pytest.fixture(scope="module")
def acdc():
    return synthetic_dataset("acdc", num_scans=12, slices_per_scan=(6, 10), canvas=64, seed=3)


def test_synthetic_structure(acdc):
    assert len(acdc.get_scan_list()) == 12
    assert set(np.unique(acdc.partitions)) <= {0, 1, 2}
    assert acdc.images.dtype == np.uint8
    # partitions must be monotone within a scan
    for scan, idx in acdc.scan_to_indices().items():
        p = acdc.partitions[idx]
        assert (np.diff(p) >= 0).all()


def test_partition_semantics_acdc():
    # scan_len 10, partition_num 3 -> cut=3: idx<=2 -> 0; idx<=6 -> 1; else 2
    got = [compute_partition(i, 10, 3, "acdc") for i in range(10)]
    assert got == [0, 0, 0, 1, 1, 1, 1, 2, 2, 2]


def test_partition_semantics_div():
    # scan_len 16, partition_num 8 -> cut=2: idx // 3
    got = [compute_partition(i, 16, 8, "div") for i in range(16)]
    assert got == [i // 3 for i in range(16)]


def test_extract_subset(acdc):
    scans = acdc.get_scan_list()[:3]
    sub = extract_sub_dataset_based_on_scan_names(acdc, scans)
    assert set(sub.get_scan_list()) == set(scans)
    assert len(sub) == sum(len(acdc.scan_to_indices()[s]) for s in scans)


def test_batch_with_padding(acdc):
    batch = acdc.batch(np.asarray([0, 1, -1]))
    assert batch["image"].shape == (3, 64, 64, 1)
    assert batch["valid"].tolist() == [1.0, 1.0, 0.0]
    assert batch["partition"][2] == -1
    # images ship as packed uint8 (device casts); see steps._as_float_image
    assert batch["image"].dtype == np.uint8


def test_infinite_sampler_reshuffles(acdc):
    it = iter(InfiniteRandomSampler(acdc, batch_size=16, seed=0))
    b1, b2 = next(it), next(it)
    assert b1.shape == (16,)
    assert not np.array_equal(b1, b2)


def test_scan_batch_sampler_per_scan(acdc):
    sampler = ScanBatchSampler(acdc, pad_to=12)
    batches = list(sampler)
    assert len(batches) == 12
    for b in batches:
        real = b[b >= 0]
        names = {acdc.scan_names[i] for i in real}
        assert len(names) == 1


def test_contrast_batch_sampler_structure(acdc):
    sampler = ContrastBatchSampler(acdc, scan_sample_num=4, partition_sample_num=1, seed=0)
    assert sampler.batch_size == 12
    batch = next(iter(sampler))
    real = batch[batch >= 0]
    # one slice per (scan, partition): scans appear <= 3 times (3 partitions)
    scans = [acdc.scan_names[i] for i in real]
    parts = [int(acdc.partitions[i]) for i in real]
    from collections import Counter
    per_scan = Counter(scans)
    assert all(v <= 3 for v in per_scan.values())
    assert len(set(per_scan)) == 4
    pairs = list(zip(scans, parts))
    assert len(set(pairs)) == len(pairs)  # unique (scan, partition) combos


def test_split_dataset_deterministic(acdc):
    a1, b1 = split_dataset(acdc, 0.5, seed=1)[:2]
    a2, b2 = split_dataset(acdc, 0.5, seed=1)[:2]
    assert a1.get_scan_list() == a2.get_scan_list()
    assert set(a1.get_scan_list()).isdisjoint(b1.get_scan_list())
    assert len(a1.get_scan_list()) == 6


def test_predefined_split():
    ds = synthetic_dataset("acdc", num_scans=8, canvas=32, seed=0)
    # deterministically rename the first scan to the predefined 1-scan split
    # id (the synthetic cycle suffix is random, so don't depend on it)
    first = ds.unique_scans[0]
    ds.scan_names = [("patient100_00" if s == first else s) for s in ds.scan_names]
    ds.filenames = [f.replace(first, "patient100_00") for f in ds.filenames]
    ds.unique_scans = sorted(set(ds.scan_names))
    lab, unlab = split_dataset_with_predefined_filenames(ds, "acdc", 1)
    assert lab.get_scan_list() == ["patient100_00"]


def test_get_data_end_to_end(acdc):
    lab, unlab, val, test = get_data(
        tra_set=acdc, test_set=synthetic_dataset("acdc", num_scans=6, canvas=64, seed=9, mode="val"),
        labeled_scan_num=2, labeled_batch_size=4, unlabeled_batch_size=4,
        load_predefined_list=False)
    batch = next(iter(lab))
    assert batch["image"].shape == (4, 64, 64, 1)
    val_batches = list(iter(val))
    assert len(val_batches) == len(val.dataset.get_scan_list())
    # all eval batches share one static shape
    shapes = {b["image"].shape for b in val_batches}
    assert len(shapes) == 1


def test_contrastive_loader(acdc):
    loader = create_contrastive_loader(acdc, scan_sample_num=4)
    batch = next(iter(loader))
    assert batch["image"].shape[0] == 12


# --------------------------------------------------------------------- augmentation
def test_augment_once_shapes_and_determinism(acdc):
    batch = acdc.batch(np.arange(6))
    img_f = jnp.asarray(batch["image"], jnp.float32) / 255.0
    lab_i = jnp.asarray(batch["label"], jnp.int32)
    key = jax.random.PRNGKey(0)
    pol = AugmentPolicy(crop=48, rot_degrees=45.0)
    img1, lab1 = augment_once(key, img_f, lab_i, pol)
    img2, lab2 = augment_once(key, img_f, lab_i, pol)
    assert img1.shape == (6, 48, 48, 1)
    assert lab1.shape == (6, 48, 48)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))  # same key -> same aug
    img3, _ = augment_once(jax.random.PRNGKey(1), img_f, lab_i, pol)
    assert not np.allclose(np.asarray(img1), np.asarray(img3))


def test_augment_label_image_geometry_synchronized(acdc):
    """Label must undergo the same geometry as the image: warp a mask as image
    (bilinear) and as label (nearest) and check overlap is high."""
    batch = acdc.batch(np.arange(4))
    mask = (batch["label"] > 0).astype(np.float32)
    key = jax.random.PRNGKey(2)
    pol = AugmentPolicy(crop=48, rot_degrees=30.0, jitter=False)
    img_out, lab_out = augment_once(key, jnp.asarray(mask[..., None]),
                                    jnp.asarray((mask > 0).astype(np.int32)), pol)
    bin_img = np.asarray(img_out[..., 0]) > 0.5
    bin_lab = np.asarray(lab_out) > 0
    agree = (bin_img == bin_lab).mean()
    assert agree > 0.97, agree


def test_augment_twice_total_freedom(acdc):
    batch = acdc.batch(np.arange(4))
    img = jnp.asarray(batch["image"], jnp.float32) / 255.0
    lab = jnp.asarray(batch["label"], jnp.int32)
    pol = AugmentPolicy(crop=48, jitter=False)
    key = jax.random.PRNGKey(3)
    (i1, l1), (i2, l2) = augment_twice(key, img, lab, pol, total_freedom=False)
    # shared geometry, no jitter -> identical views
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)
    (i1f, _), (i2f, _) = augment_twice(key, img, lab, pol, total_freedom=True)
    assert not np.allclose(np.asarray(i1f), np.asarray(i2f))


def test_center_crop_identity_region(acdc):
    batch = acdc.batch(np.arange(2))
    img = jnp.asarray(batch["image"], jnp.float32) / 255.0
    out, _ = center_crop(img, None, 48)
    start = (64 - 48) // 2
    np.testing.assert_allclose(np.asarray(out[:, :, :, 0]),
                               batch["image"][:, start:start + 48, start:start + 48, 0] / 255.0,
                               atol=1e-5)


def test_flip_replay_on_different_resolution():
    key = jax.random.PRNGKey(4)
    params = flip_params(key, 3, threshold=0.8)
    x = jnp.asarray(np.random.rand(3, 16, 16, 2).astype(np.float32))
    y = jnp.asarray(np.random.rand(3, 8, 8, 5).astype(np.float32))
    fx = apply_flip(x, params)
    fx2 = apply_flip(fx, params)
    np.testing.assert_allclose(np.asarray(fx2), np.asarray(x), atol=1e-7)  # involution
    fy = apply_flip(y, params)  # replay at other resolution works
    assert fy.shape == y.shape
