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


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host (DCN) wiring — SURVEY §5.8's second half.

    Joins this process to a jax.distributed cluster so `jax.devices()` spans
    every host's chips and GSPMD collectives cross the DCN. Arguments default
    to the SPCL_COORDINATOR / SPCL_NUM_PROCESSES / SPCL_PROCESS_ID env vars;
    with none present (and no cluster autodetect env), this is a no-op
    single-process setup. Idempotent. Returns jax.process_count().

    The reference's analog is the vestigial `_DDPMixin`
    (contrastyou/trainer/base.py:23) — scaffolding with no process-group
    init anywhere; here the path is real and tested by a 2-process CPU
    cluster (tests/test_multihost.py).
    """
    import os
    coordinator = coordinator or os.environ.get("SPCL_COORDINATOR")
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get("SPCL_NUM_PROCESSES", 0)) or None
    process_id = process_id if process_id is not None else \
        (int(os.environ["SPCL_PROCESS_ID"])
         if "SPCL_PROCESS_ID" in os.environ else None)
    if coordinator is None:
        return jax.process_count()
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def put_tree(tree: Any, mesh: Mesh, spec: PartitionSpec) -> Any:
    """Host -> device with an arbitrary PartitionSpec, multi-host safe.

    Single process: plain device_put. Multi process: every process holds the
    same GLOBAL host value (the samplers are seed-deterministic), so each
    builds its addressable shards via jax.make_array_from_callback — the
    standard per-process ingestion recipe; no host ever materializes another
    host's shard on device."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Put a host batch dict with axis-0 sharding over the mesh."""
    return put_tree(batch, mesh, P(axis))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (TrainState, keys, scalars) over the mesh.

    Device-resident leaves (an already-replicated TrainState on resume)
    keep the fast device_put path; host leaves go through put_tree for
    multi-host safety."""
    if jax.process_count() == 1:
        sh = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
    return put_tree(jax.device_get(tree), mesh, P())


def on_master() -> bool:
    return jax.process_index() == 0


_BARRIER_SEQ = [0]


def host_barrier(tag: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier through the coordination service (host-side —
    no device collective, so it cannot hit the CPU-gloo 30s context-init
    timeout it exists to prevent). Processes must reach barriers in the same
    order; a monotonic sequence number keeps ids unique per use. No-op
    single-process."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed
    _BARRIER_SEQ[0] += 1
    distributed.global_state.client.wait_at_barrier(
        f"spcl:{tag}:{_BARRIER_SEQ[0]}", timeout_ms)
