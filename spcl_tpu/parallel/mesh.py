"""Device mesh + sharding helpers — the framework's distributed backend.

The reference has NO working distributed path (vestigial DDP scaffolding,
SURVEY.md §2.11: no process group init, no collectives anywhere). Here
scaling is native: a 1-D `data` mesh over all chips; the TrainState is
replicated and batches are sharded on axis 0. The jitted steps were written
with global-batch semantics (losses are batch means; the contrastive
similarity spans the full batch), so under GSPMD XLA inserts the gradient
psum and the embedding all_gather over ICI automatically — the
scaling-book recipe: pick a mesh, annotate shardings, let XLA place
collectives.

Cross-replica BatchNorm: pass axis_name="data" to UNet when constructing it
for an explicitly shard_map'ed step; under plain GSPMD jit the BN batch
statistics are already computed over the global batch because the mean/var
reductions are global ops.

`on_master()` replaces the reference's `_DDPMixin.on_master`
(contrastyou/trainer/base.py:23) with jax.process_index().
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Device_put a host batch dict with axis-0 sharding over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (TrainState, keys, scalars) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def on_master() -> bool:
    return jax.process_index() == 0
