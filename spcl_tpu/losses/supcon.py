"""Supervised-contrastive and self-paced supervised-contrastive losses.

Math parity with reference contrastyou/losses/contrast_loss3.py:
- `supcon_loss`           <-> SupConLoss1 (:34-110), incl. `exclude_other_pos`
- `self_paced_supcon_loss`<-> SelfPacedSupConLoss (:113-222): per-pair
  self-paced weights from the pair negative-log-likelihood against an age
  parameter gamma — hard (w = [l <= gamma]) or soft (w = max(1 - l/gamma, 0)),
  weights forced to 1 off the positive mask, optional `correct_grad`
  rescaling by the mean selected ratio (:199-201).

TPU-first design, not a translation:
- pure functions (loss, aux) rather than stateful nn.Modules with
  attribute side channels; aux carries downgrade_ratio & friends;
- the pair masks derive on the fly from integer meta-label vectors
  inside the traced program — nothing host-side;
- an optional `valid` vector supports padded batches (the reference's
  ContrastBatchSampler can emit short batches, rearr.py:67-72; XLA needs
  static shapes, so we pad and mask instead);
- f32 accumulation throughout; the max-subtraction uses the *global*
  detached max exactly like the reference (:28-29) — for L2-normalized
  inputs this equals 1/T because the diagonal z.z = 1 is always present.

This is the reference (naive-jnp) implementation; spcl_tpu/ops provides a
fused blockwise Pallas kernel behind the same interface that never
materializes the [2N,2N] masks in HBM.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-16


class SupConAux(NamedTuple):
    """Diagnostics mirroring the reference's attribute side channel
    (contrast_loss3.py:89-93, 188-191). Matrices are returned only when
    requested — they are O((2N)^2) HBM traffic."""
    downgrade_ratio: jnp.ndarray  # mean self-paced weight over positive pairs
    pos_pair_count: jnp.ndarray
    sim_logits: Optional[jnp.ndarray] = None
    pos_mask: Optional[jnp.ndarray] = None
    sp_mask: Optional[jnp.ndarray] = None


def pairwise_mask_from_labels(target: jnp.ndarray) -> jnp.ndarray:
    """[N] int labels -> [N,N] float mask: 1 where labels match (positives)."""
    return jnp.equal(target[:, None], target[None, :]).astype(jnp.float32)


def _build_masks(batch_size: int, pos_mask: Optional[jnp.ndarray],
                 target: Optional[jnp.ndarray], valid: Optional[jnp.ndarray]):
    """Tile the NxN pos/neg masks to 2Nx2N, zero the diagonal, apply padding.

    Reference semantics (contrast_loss3.py:41-59, 72-81): with neither mask
    nor target, positives are only the view pairs (SimCLR identity).
    """
    if pos_mask is None:
        if target is not None:
            pos_mask = pairwise_mask_from_labels(target)
        else:
            pos_mask = jnp.eye(batch_size, dtype=jnp.float32)
    neg_mask = 1.0 - pos_mask
    pos2 = jnp.tile(pos_mask, (2, 2))
    neg2 = jnp.tile(neg_mask, (2, 2))
    not_diag = 1.0 - jnp.eye(2 * batch_size, dtype=jnp.float32)
    pos2 = pos2 * not_diag
    neg2 = neg2 * not_diag
    if valid is not None:
        v = jnp.concatenate([valid, valid]).astype(jnp.float32)
        vv = v[:, None] * v[None, :]
        pos2 = pos2 * vv
        neg2 = neg2 * vv
    return pos2, neg2


def _sim_logits(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float):
    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    logits = jnp.dot(z, z.T, preferred_element_type=jnp.float32) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits))
    return logits


def _log_likelihood_matrix(sim_logits, pos2, neg2, exclude_other_pos: bool):
    sim_exp = jnp.exp(sim_logits)
    pos_count = jnp.sum(pos2, axis=1)
    neg_count = jnp.sum(neg2, axis=1)
    pos_sum = jnp.sum(sim_exp * pos2, axis=1, keepdims=True)
    neg_sum = jnp.sum(sim_exp * neg2, axis=1, keepdims=True)
    if exclude_other_pos:
        # reference contrast_loss3.py:97-100: denominator keeps only this
        # pair + scaled negatives (SimCLR-style denominator correction)
        neg_ratio = neg_count / jnp.maximum(pos_count + neg_count, 1.0)
        log_prob = sim_logits - jnp.log(sim_exp + neg_sum / (neg_ratio + 1e-4)[:, None] + _EPS)
    else:
        log_prob = sim_logits - jnp.log(pos_sum + neg_sum + _EPS)
    return log_prob, pos_count


def _reduce_over_positives(log_prob, pos2, pos_count, valid):
    row_loss = jnp.sum(log_prob * pos2, axis=1) / jnp.maximum(pos_count, 1.0)
    if valid is None:
        return -jnp.mean(row_loss)
    v = jnp.concatenate([valid, valid]).astype(jnp.float32)
    # rows with no positive pair (padding) contribute nothing
    row_ok = v * (pos_count > 0)
    return -jnp.sum(row_loss * row_ok) / jnp.maximum(jnp.sum(row_ok), 1.0)


def supcon_loss(z1: jnp.ndarray, z2: jnp.ndarray, *,
                target: Optional[jnp.ndarray] = None,
                pos_mask: Optional[jnp.ndarray] = None,
                valid: Optional[jnp.ndarray] = None,
                temperature: float = 0.07,
                exclude_other_pos: bool = False,
                return_matrices: bool = False):
    """SupCon/SimCLR loss over two views of N embeddings.

    z1, z2: [N, D] L2-normalized projections (view 1, view 2).
    target: [N] int meta-labels (positives = equal labels), or None for SimCLR.
    pos_mask: explicit [N, N] mask overriding `target`.
    valid: [N] 1/0 padding mask.
    Returns (loss, SupConAux).
    """
    n = z1.shape[0]
    pos2, neg2 = _build_masks(n, pos_mask, target, valid)
    sim_logits = _sim_logits(z1, z2, temperature)
    log_prob, pos_count = _log_likelihood_matrix(sim_logits, pos2, neg2, exclude_other_pos)
    loss = _reduce_over_positives(log_prob, pos2, pos_count, valid)
    aux = SupConAux(
        downgrade_ratio=jnp.asarray(1.0, jnp.float32),
        pos_pair_count=jnp.sum(pos2),
        sim_logits=sim_logits if return_matrices else None,
        pos_mask=pos2 if return_matrices else None,
    )
    return loss, aux


def self_paced_supcon_loss(z1: jnp.ndarray, z2: jnp.ndarray, *,
                           gamma,
                           target: Optional[jnp.ndarray] = None,
                           pos_mask: Optional[jnp.ndarray] = None,
                           valid: Optional[jnp.ndarray] = None,
                           temperature: float = 0.07,
                           weight_update: str = "hard",
                           correct_grad: bool = False,
                           return_matrices: bool = False):
    """Self-paced SupCon: per-pair weights from pair loss vs age parameter gamma.

    gamma may be a python float or a traced scalar (so the γ schedule can
    feed the jitted step without retracing).
    """
    assert weight_update in ("hard", "soft"), weight_update
    n = z1.shape[0]
    gamma = jnp.asarray(gamma, jnp.float32)
    pos2, neg2 = _build_masks(n, pos_mask, target, valid)
    sim_logits = _sim_logits(z1, z2, temperature)
    log_prob, pos_count = _log_likelihood_matrix(sim_logits, pos2, neg2, exclude_other_pos=False)

    # ---- self-paced weights (no-grad; reference :207-214) ----
    l_ij = -jax.lax.stop_gradient(log_prob)
    if weight_update == "hard":
        w = (l_ij <= gamma).astype(jnp.float32)
    else:
        w = jnp.maximum(1.0 - l_ij / gamma, 0.0)
    sp_mask = jnp.maximum(w, 1.0 - pos2)  # non-positive pairs keep weight 1

    pos_total = jnp.sum(pos2)
    downgrade_ratio = jnp.sum(sp_mask * pos2) / jnp.maximum(pos_total, 1.0)

    weighted_log_prob = log_prob * sp_mask
    loss = _reduce_over_positives(weighted_log_prob, pos2, pos_count, valid)
    if correct_grad:
        # reference :199-201 divides by the batch ratio when it is > 0
        loss = jnp.where(downgrade_ratio > 0, loss / jnp.maximum(downgrade_ratio, _EPS), loss)

    aux = SupConAux(
        downgrade_ratio=downgrade_ratio,
        pos_pair_count=pos_total,
        sim_logits=sim_logits if return_matrices else None,
        pos_mask=pos2 if return_matrices else None,
        sp_mask=sp_mask if return_matrices else None,
    )
    return loss, aux


# --------------------------------------------------------------------------- soft-weighted family
def _row_mean(row: jnp.ndarray, row_ok: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over rows; with a row mask, mean over the unmasked rows only
    (padded batches: pad rows contribute nothing and don't dilute)."""
    if row_ok is None:
        return jnp.mean(row)
    return jnp.sum(row * row_ok) / jnp.maximum(jnp.sum(row_ok), 1.0)


def _valid2(valid: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    if valid is None:
        return None
    return jnp.concatenate([valid, valid]).astype(jnp.float32)


def supcon_loss_in_mode(z1: jnp.ndarray, z2: jnp.ndarray, *,
                        target: Optional[jnp.ndarray] = None,
                        pos_mask: Optional[jnp.ndarray] = None,
                        valid: Optional[jnp.ndarray] = None,
                        temperature: float = 0.07) -> jnp.ndarray:
    """SupConLoss2 "in" mode (reference contrast_loss.py:95-97):
    loss_i = -log(pos_sum_i / (pos_sum_i + neg_sum_i)) / pos_count_i.
    `valid` [N]: 1/0 padding mask (padded rows/columns are excluded)."""
    n = z1.shape[0]
    pos2, neg2 = _build_masks(n, pos_mask, target, valid)
    sim_logits = _sim_logits(z1, z2, temperature)
    sim_exp = jnp.exp(sim_logits)
    pos_sum = jnp.sum(sim_exp * pos2, axis=1)
    neg_sum = jnp.sum(sim_exp * neg2, axis=1)
    pos_count_raw = jnp.sum(pos2, axis=1)
    pos_count = jnp.maximum(pos_count_raw, 1.0)
    row = -jnp.log(jnp.maximum(pos_sum, _EPS) / jnp.maximum(pos_sum + neg_sum, _EPS)) / pos_count
    v2 = _valid2(valid)
    row_ok = None if v2 is None else v2 * (pos_count_raw > 0)
    return _row_mean(row, row_ok)


def soft_supcon_loss(z1: jnp.ndarray, z2: jnp.ndarray, *, pos_weight: jnp.ndarray,
                     temperature: float = 0.07, out_mode: bool = True,
                     enable_mask: Optional[jnp.ndarray] = None,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Soft-weighted SupCon (reference SupConLoss3, contrast_loss.py:130-181):
    per-pair FLOAT weights instead of a binary mask.

    pos_weight: [N, N] weights (tiled 2x2 internally).
    enable_mask: optional [2N, 2N] 0/1 mask restricting the denominator
    (SupConLoss4's block assembly, contrast_loss.py:207-267).
    valid: [N] 1/0 padding mask — padded rows/columns drop out of the
    weights, the denominator and the row mean.
    """
    n = z1.shape[0]
    w2 = jnp.tile(pos_weight.astype(jnp.float32), (2, 2))
    not_diag = 1.0 - jnp.eye(2 * n, dtype=jnp.float32)
    v2 = _valid2(valid)
    if v2 is not None:
        not_diag = not_diag * (v2[:, None] * v2[None, :])
    sim_logits = _sim_logits(z1, z2, temperature)
    sim_exp = jnp.exp(sim_logits)
    denom_mask = not_diag if enable_mask is None else not_diag * enable_mask
    denominator = jnp.sum(sim_exp * denom_mask, axis=1, keepdims=True)
    exp_div = sim_exp / jnp.maximum(denominator, _EPS)
    w2 = w2 * not_diag
    w_sum = jnp.maximum(jnp.sum(w2, axis=1), _EPS)
    if out_mode:
        row = jnp.sum(jnp.log(exp_div + _EPS) * w2, axis=1) / w_sum
    else:
        row = jnp.log(jnp.sum(exp_div * w2, axis=1) + _EPS) / w_sum
    return -_row_mean(row, v2)


def assemble_block_weights(n: int, *, one2one: Optional[jnp.ndarray] = None,
                           two2two: Optional[jnp.ndarray] = None,
                           one2two: Optional[jnp.ndarray] = None):
    """SupConLoss4 block assembly (contrast_loss.py:217-237): build the
    [2N, 2N] pos_weight + enable_mask from per-block [N, N] weights."""
    pos_weight = jnp.zeros((2 * n, 2 * n), jnp.float32)
    enable = jnp.zeros((2 * n, 2 * n), jnp.float32)
    if one2one is not None:
        pos_weight = pos_weight.at[:n, :n].set(one2one)
        enable = enable.at[:n, :n].set(1.0)
    if two2two is not None:
        pos_weight = pos_weight.at[n:, n:].set(two2two)
        enable = enable.at[n:, n:].set(1.0)
    if one2two is not None:
        pos_weight = pos_weight.at[:n, n:].set(one2two)
        pos_weight = pos_weight.at[n:, :n].set(one2two)
        enable = enable.at[:n, n:].set(1.0)
        enable = enable.at[n:, :n].set(1.0)
    return pos_weight, enable


def block_soft_supcon_loss(z1: jnp.ndarray, z2: jnp.ndarray, *,
                           one2one_weight: Optional[jnp.ndarray] = None,
                           two2two_weight: Optional[jnp.ndarray] = None,
                           one2two_weight: Optional[jnp.ndarray] = None,
                           temperature: float = 0.07, out_mode: bool = True,
                           valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SupConLoss4 parity: block-assembled soft weights with an enable mask
    restricting the denominator to active blocks. `valid` [N]: padding mask."""
    n = z1.shape[0]
    pos_weight, enable = assemble_block_weights(
        n, one2one=one2one_weight, two2two=two2two_weight, one2two=one2two_weight)
    # soft_supcon_loss tiles [N,N]; here we already have [2N,2N]: inline it
    not_diag = 1.0 - jnp.eye(2 * n, dtype=jnp.float32)
    v2 = _valid2(valid)
    if v2 is not None:
        not_diag = not_diag * (v2[:, None] * v2[None, :])
    sim_logits = _sim_logits(z1, z2, temperature)
    sim_exp = jnp.exp(sim_logits)
    denominator = jnp.sum(sim_exp * not_diag * enable, axis=1, keepdims=True)
    exp_div = sim_exp / jnp.maximum(denominator, _EPS)
    w2 = pos_weight * not_diag
    w_sum = jnp.maximum(jnp.sum(w2, axis=1), _EPS)
    if out_mode:
        row = jnp.sum(jnp.log(exp_div + _EPS) * w2, axis=1) / w_sum
    else:
        row = jnp.log(jnp.sum(exp_div * w2, axis=1) + _EPS) / w_sum
    return -_row_mean(row, v2)
