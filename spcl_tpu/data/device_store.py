"""Device-resident dataset store.

The reference streams every batch from host workers
(contrastyou/data/loader.py); over this environment's device link that
makes training transfer-bound (~10MB/s effective). All of the reference's
datasets are small (ACDC train ≈ 125MB packed uint8), so the TPU-native
answer is to keep the ENTIRE packed dataset in HBM: upload once, and each
step gathers its batch by index inside the jitted program. The only
per-step host->device traffic is the index vector (a few hundred bytes).

`DeviceStore` is built on a ROOT dataset; labeled/unlabeled/contrastive
subsets all sample indices into the same store (SliceDataset.global_indices),
so one store serves every loader and the compiled step is shared across a
finetune ratio sweep.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import SliceDataset

_STORE_CACHE: Dict[int, "DeviceStore"] = {}


class DeviceStore:
    def __init__(self, root: SliceDataset, mesh=None):
        assert root.root is root, "build the store on the ROOT dataset"
        # Pin the root: _STORE_CACHE keys on id(root), which is only stable
        # while the root object is alive — without this reference a collected
        # root's id could be reused by a different dataset and silently serve
        # it the OLD store's arrays.
        self.root = root
        # multi-chip: the store replicates over the mesh (every chip gathers
        # its batch shard from its own copy; the datasets are small — ACDC
        # packed ~125MB — so replication beats a sharded store + collective)
        if mesh is not None:
            # multi-host safe replication (parallel/mesh.py::put_tree): each
            # process only materializes its addressable replicas
            from jax.sharding import PartitionSpec
            from ..parallel import put_tree
            put = lambda x: put_tree(x, mesh, PartitionSpec())  # noqa: E731
        else:
            put = lambda x: jax.device_put(x)  # noqa: E731
        imgs = root.images if root.images.ndim == 4 else root.images[..., None]
        self.n = imgs.shape[0]
        self.images = put(imgs)              # uint8 [N,H,W,C]
        self.labels = put(root.labels)       # uint8 [N,H,W]
        self.sizes = put(root.sizes.astype(np.int32))  # [N,2]
        self.scan_idx = put(root.scan_index.astype(np.int32))
        self.patient = put(root.patient_index.astype(np.int32))
        self.partition = put(root.partitions.astype(np.int32))
        self.cycle = put(root.cycles.astype(np.int32))

    @classmethod
    def for_dataset(cls, ds: SliceDataset, mesh=None) -> "DeviceStore":
        """One store per (root dataset, mesh) per process."""
        key = (id(ds.root),
               None if mesh is None else tuple(d.id for d in mesh.devices.flat))
        if key not in _STORE_CACHE:
            _STORE_CACHE[key] = cls(ds.root, mesh=mesh)
        return _STORE_CACHE[key]

    def nbytes(self) -> int:
        return int(self.images.nbytes + self.labels.nbytes)

    @property
    def arrays(self) -> Dict[str, jnp.ndarray]:
        """Pass these as EXPLICIT jit arguments. Closure-capturing them bakes
        them in as program constants, which this backend re-materializes per
        call (measured 25x step slowdown); as arguments the committed device
        buffers are passed by reference."""
        return {"image": self.images, "label": self.labels, "size": self.sizes,
                "scan_idx": self.scan_idx, "patient": self.patient,
                "partition": self.partition, "cycle": self.cycle}

    def gather(self, idx: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return gather_from(self.arrays, idx)


def gather_from(arrays: Dict[str, jnp.ndarray], idx: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Traced: [B] int32 global indices (-1 = padding) -> batch dict.

    Matches SliceDataset.batch's contract: uint8 image/label (the step
    casts on device), -1 meta labels and valid=0 on padding.
    """
    idx = idx.astype(jnp.int32)
    valid = (idx >= 0).astype(jnp.float32)
    safe = jnp.maximum(idx, 0)
    pad = idx < 0
    return {
        "image": arrays["image"][safe],
        "label": arrays["label"][safe],
        "size": arrays["size"][safe],
        "scan_idx": jnp.where(pad, -1, arrays["scan_idx"][safe]),
        "patient": jnp.where(pad, -1, arrays["patient"][safe]),
        "partition": jnp.where(pad, -1, arrays["partition"][safe]),
        "cycle": jnp.where(pad, -1, arrays["cycle"][safe]),
        "valid": valid,
    }
