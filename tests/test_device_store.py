"""DeviceStore gather must agree exactly with the host batch path."""
import jax.numpy as jnp
import numpy as np

from spcl_tpu.data import split_dataset, synthetic_dataset
from spcl_tpu.data.device_store import DeviceStore, gather_from


def test_gather_matches_host_batch():
    ds = synthetic_dataset("acdc", num_scans=6, slices_per_scan=(4, 6), canvas=32, seed=0)
    store = DeviceStore.for_dataset(ds)
    idx = np.asarray([0, 3, -1, 5], np.int64)
    host = ds.batch(idx)
    dev = {k: np.asarray(v) for k, v in store.gather(jnp.asarray(idx, jnp.int32)).items()}
    np.testing.assert_array_equal(host["image"], dev["image"])
    np.testing.assert_array_equal(host["label"].astype(np.uint8), dev["label"])
    for k in ("scan_idx", "patient", "partition", "cycle"):
        np.testing.assert_array_equal(host[k], dev[k])
    np.testing.assert_array_equal(host["valid"], dev["valid"])


def test_subset_global_indices_roundtrip():
    ds = synthetic_dataset("acdc", num_scans=6, slices_per_scan=(4, 6), canvas=32, seed=0)
    sub_a, sub_b = split_dataset(ds, 0.5, seed=1)[:2]
    assert sub_a.root is ds
    store = DeviceStore.for_dataset(sub_a)  # builds on the ROOT
    assert store.n == len(ds)
    local = np.asarray([0, 1, -1])
    gidx = sub_a.to_global(local)
    assert gidx[2] == -1
    # subset row 0 must be the same slice as root row gidx[0]
    np.testing.assert_array_equal(sub_a.images[0], ds.images[gidx[0]])
    dev = store.gather(jnp.asarray(gidx, jnp.int32))
    np.testing.assert_array_equal(np.asarray(dev["image"][0, ..., 0]), sub_a.images[0])
    # store caching: same root -> same store object
    assert DeviceStore.for_dataset(sub_b) is store
