"""Global-batch contrastive loss under explicit sharding.

SURVEY.md §5.7: the reference's structural analog of sequence parallelism is
the NxN contrastive similarity matrix whose "context" is the global batch —
and the reference never scales it (single GPU, 2N=60). Here the embeddings
are all-gathered over the `data` axis of the mesh so the matrix spans the
global batch, then the fused blockwise kernel (ops/supcon_pallas.py) — or
the naive path off-TPU — computes the loss per replica. Losses/grads are
identical on every replica (the gather is differentiable: each shard's
gradient flows back through its own rows via the psum_scatter implicit in
all_gather's transpose).

Two entry points:
- `global_self_paced_supcon(...)` — call INSIDE an existing shard_map/jit
  region with a named axis.
- `make_global_supcon_fn(mesh, ...)` — wraps the loss in its own shard_map
  for standalone use/testing.

Under plain GSPMD jit (the default trainers), none of this is needed — XLA
inserts the all_gather automatically (tests/test_parallel.py); this module
is for explicitly shard_map'ed training loops and for very large global
batches where manual placement matters.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses.supcon import self_paced_supcon_loss, supcon_loss
from ..ops import fused_self_paced_supcon


def global_self_paced_supcon(z1_shard, z2_shard, target_shard, valid_shard, *,
                             gamma, axis_name: str = "data",
                             temperature: float = 0.07,
                             weight_update: str = "soft",
                             correct_grad: bool = False,
                             use_fused: bool = None):
    """Self-paced SupCon over the GLOBAL batch from per-shard embeddings.

    z*_shard: [n_local, D]; target/valid: [n_local]. Must be called inside a
    shard_map (or pmap) region with `axis_name` bound. Returns
    (loss, downgrade_ratio), identical on every replica.
    """
    z1 = jax.lax.all_gather(z1_shard, axis_name, tiled=True)
    z2 = jax.lax.all_gather(z2_shard, axis_name, tiled=True)
    target = jax.lax.all_gather(target_shard, axis_name, tiled=True)
    valid = jax.lax.all_gather(valid_shard, axis_name, tiled=True)
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu" and z1.shape[0] * 2 >= 1024
    if use_fused:
        return fused_self_paced_supcon(
            z1, z2, gamma=gamma, target=target, valid=valid,
            temperature=temperature, weight_update=weight_update,
            correct_grad=correct_grad)
    loss, aux = self_paced_supcon_loss(
        z1, z2, gamma=gamma, target=target, valid=valid, temperature=temperature,
        weight_update=weight_update, correct_grad=correct_grad)
    return loss, aux.downgrade_ratio


def make_global_supcon_fn(mesh: Mesh, *, axis_name: str = "data",
                          temperature: float = 0.07, weight_update: str = "soft",
                          correct_grad: bool = False, use_fused: Optional[bool] = None):
    """Standalone jitted fn(z1, z2, target, valid, gamma) -> (loss, ratio)
    with batch-sharded inputs over `mesh`."""
    def shard_fn(z1, z2, target, valid, gamma):
        loss, ratio = global_self_paced_supcon(
            z1, z2, target, valid, gamma=gamma, axis_name=axis_name,
            temperature=temperature, weight_update=weight_update,
            correct_grad=correct_grad, use_fused=use_fused)
        return loss, ratio

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded)
