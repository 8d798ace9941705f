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
from ..ops import (FUSED_MIN_ROWS, fused_self_paced_supcon,
                   sharded_fused_self_paced_supcon)

# Auto crossover for the ROW-SHARDED strip (see sharded_self_paced_supcon
# docstring; measured in scripts/measure_strip_r4.py): the naive strip's ~5
# materialized [2n_local, 2N] f32 temporaries are faster until they threaten
# HBM; 2e8 elements ~ 4GB of temporaries on a 16GB v5e, leaving room for
# model + activations. Above it, only the fused strip can run at all.
_FUSED_MIN_STRIP_ELEMS = int(2e8)


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
        use_fused = (jax.default_backend() == "tpu"
                     and z1.shape[0] * 2 >= FUSED_MIN_ROWS)
    if use_fused:
        return fused_self_paced_supcon(
            z1, z2, gamma=gamma, target=target, valid=valid,
            temperature=temperature, weight_update=weight_update,
            correct_grad=correct_grad)
    loss, aux = self_paced_supcon_loss(
        z1, z2, gamma=gamma, target=target, valid=valid, temperature=temperature,
        weight_update=weight_update, correct_grad=correct_grad)
    return loss, aux.downgrade_ratio


def sharded_self_paced_supcon(z1_shard, z2_shard, target_shard, valid_shard, *,
                              gamma, axis_name: str = "data",
                              temperature: float = 0.07,
                              weight_update: str = "soft",
                              correct_grad: bool = False,
                              use_fused=None):
    """ROW-SHARDED global self-paced SupCon — the ring-attention-shaped form
    (SURVEY §5.7) that actually scales the O((2N)^2) matrix.

    `global_self_paced_supcon` all-gathers and computes the FULL [2N, 2N]
    matrix on every replica (replicated compute: fine for correctness, zero
    per-chip savings). Here each shard computes only ITS row block
    [2n_local, 2N] — per-chip similarity compute and memory drop by the mesh
    size D — and the row reductions combine with one psum. Decomposition is
    exact: the loss is a mean over rows whose terms need only full-ROW sums
    (available locally after the column all_gather), and the reference's
    detached global max-subtraction equals 1/T for L2-normalized inputs
    because every local row block contains its own diagonal.

    use_fused dispatches each shard's strip to the blockwise Pallas kernel
    (ops.sharded_fused_self_paced_supcon) — the strip never materializes in
    HBM either, composing the two halves of §5.7 end to end. None = auto,
    MEASURED policy (scripts/measure_strip_r4.py, v5e device plane,
    benchmarks/strip_r4.json): at strip sizes whose ~5 materialized
    [2n_local, 2N] f32 temporaries fit HBM, the naive strip is ~1.3-1.4x
    FASTER than the fused strip (the flash-style recompute — two forward
    matmul passes + bwd — costs more than materialization saves; measured
    0.97 vs 1.40 ms at rows 2048 x cols 16k, 4.20 vs 5.56 ms at 4096 x 32k),
    so auto picks naive below _FUSED_MIN_STRIP_ELEMS and fused above, where
    the naive strip would blow HBM (~2N >= 40k at mesh 8). This differs from
    the REPLICATED path, where fused wins at every size from 2N=128 up
    (3.52x at 2N=8k/16k — same measurement run).

    Inputs are per-shard [n_local, D] / [n_local]; must run inside shard_map
    with `axis_name` bound. Returns (loss, downgrade_ratio), identical on
    every replica and equal to the single-device loss on the gathered batch
    (tests/test_parallel.py, tests/test_parallel_fused.py). Backward: the
    all_gather transposes to a reduce_scatter automatically (naive path) /
    folds the column term in via symmetry (fused path).
    """
    if use_fused is None:
        two_n_global = 2 * z1_shard.shape[0] * jax.lax.axis_size(axis_name)
        strip_elems = 2 * z1_shard.shape[0] * two_n_global
        use_fused = (jax.default_backend() == "tpu"
                     and strip_elems >= _FUSED_MIN_STRIP_ELEMS)
    if use_fused:
        return sharded_fused_self_paced_supcon(
            z1_shard, z2_shard, target_shard, valid_shard, gamma=gamma,
            axis_name=axis_name, temperature=temperature,
            weight_update=weight_update, correct_grad=correct_grad)
    zg1 = jax.lax.all_gather(z1_shard, axis_name, tiled=True)   # [N, D]
    zg2 = jax.lax.all_gather(z2_shard, axis_name, tiled=True)
    tg = jax.lax.all_gather(target_shard, axis_name, tiled=True)
    vg = jax.lax.all_gather(valid_shard, axis_name, tiled=True).astype(jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)

    n_local = z1_shard.shape[0]
    n_global = zg1.shape[0]
    idx = jax.lax.axis_index(axis_name)
    row_off = idx * n_local  # this shard's rows within the z1 half

    z_rows = jnp.concatenate([z1_shard, z2_shard], axis=0).astype(jnp.float32)
    z_cols = jnp.concatenate([zg1, zg2], axis=0).astype(jnp.float32)
    # reference max-subtraction (contrast_loss3.py:28-29): detached GLOBAL
    # max == local-block max (diagonal present in every row block)
    sim = jnp.dot(z_rows, z_cols.T, preferred_element_type=jnp.float32) / temperature
    sim = sim - jax.lax.stop_gradient(jnp.max(sim))

    # masks for the local rows x global columns
    t_rows = jnp.concatenate([target_shard, target_shard])
    v_rows = jnp.concatenate([valid_shard, valid_shard]).astype(jnp.float32)
    t_cols = jnp.concatenate([tg, tg])
    v_cols = jnp.concatenate([vg, vg])
    pos = jnp.equal(t_rows[:, None], t_cols[None, :]).astype(jnp.float32)
    pos = pos * v_rows[:, None] * v_cols[None, :]
    # zero the diagonal: local row r maps to global column row_off + r
    # (first half) / n_global + row_off + r (second half)
    grow = jnp.concatenate([row_off + jnp.arange(n_local),
                            n_global + row_off + jnp.arange(n_local)])
    not_diag = 1.0 - (jnp.arange(2 * n_global)[None, :] == grow[:, None])
    pos = pos * not_diag
    neg = (1.0 - jnp.equal(t_rows[:, None], t_cols[None, :]).astype(jnp.float32))
    neg = neg * v_rows[:, None] * v_cols[None, :] * not_diag

    sim_exp = jnp.exp(sim)
    denom = jnp.sum(sim_exp * (pos + neg), axis=1, keepdims=True)
    log_prob = sim - jnp.log(denom + 1e-16)

    l_ij = -jax.lax.stop_gradient(log_prob)
    if weight_update == "hard":
        w = (l_ij <= gamma).astype(jnp.float32)
    else:
        w = jnp.maximum(1.0 - l_ij / gamma, 0.0)
    sp = jnp.maximum(w, 1.0 - pos)

    pos_count = jnp.sum(pos, axis=1)
    row_loss = jnp.sum(log_prob * sp * pos, axis=1) / jnp.maximum(pos_count, 1.0)
    row_ok = v_rows * (pos_count > 0)

    # one psum combines every cross-shard reduction
    parts = jax.lax.psum(jnp.stack([
        jnp.sum(row_loss * row_ok), jnp.sum(row_ok),
        jnp.sum(sp * pos), jnp.sum(pos)]), axis_name)
    loss = -parts[0] / jnp.maximum(parts[1], 1.0)
    ratio = parts[2] / jnp.maximum(parts[3], 1.0)
    if correct_grad:
        loss = jnp.where(ratio > 0, loss / jnp.maximum(ratio, 1e-16), loss)
    return loss, ratio


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


def make_sharded_supcon_fn(mesh: Mesh, *, axis_name: str = "data",
                           temperature: float = 0.07, weight_update: str = "soft",
                           correct_grad: bool = False, use_fused=None):
    """Jitted row-sharded fn(z1, z2, target, valid, gamma) -> (loss, ratio):
    per-chip compute/memory O(2N * 2N / n_devices) (sharded_self_paced_supcon)."""
    def shard_fn(z1, z2, target, valid, gamma):
        return sharded_self_paced_supcon(
            z1, z2, target, valid, gamma=gamma, axis_name=axis_name,
            temperature=temperature, weight_update=weight_update,
            correct_grad=correct_grad, use_fused=use_fused)

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded)
