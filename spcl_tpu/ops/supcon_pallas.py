"""Fused blockwise Pallas kernel for the (self-paced) SupCon loss.

The reference materializes >=5 [2N,2N] tensors in HBM per loss call
(contrast_loss3.py:156-196: sim_exp, sim_logits, pos/neg masks, the
log-likelihood matrix, the self-paced mask). This kernel streams row strips
instead: per 128-row block it computes the similarity strip on the MXU,
derives the pair masks ON THE FLY from integer meta-label vectors, reduces
the stable log-sum-exp denominator, applies the self-paced weighting, and
emits only per-row statistics — the [2N,2N] intermediates never exist in
HBM. The backward pass is a second strip kernel using the saved per-row
stats (G_ij and G_ji are both computable from row statistics because the
similarity matrix is symmetric), wired up via jax.custom_vjp.

Math parity with losses/supcon.py (which is itself parity-tested against a
loop golden model): the max-subtraction constant is exactly 1/T because the
diagonal z.z = 1 is always present in the matrix (contrast_loss3.py:28-29).

Scaling: z is kept whole in VMEM ([2N, D] f32), one strip [R, 2N] at a time
— fine through 2N ~ 8k on a 16MB-VMEM core, which covers the global batch
of a v5e pod slice after the data-axis all_gather (SURVEY.md §5.7, the
"ring-attention-shaped" piece). Column blocking can extend this later.

On non-TPU backends (CPU tests) the kernel runs in interpret mode.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 128
_EPS = 1e-16
_NEG_BIG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_to(x: jnp.ndarray, n: int, value=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=value)


def _masks(row_block, n_pad, i, labels, row_labels, valid, row_valid):
    r = row_block
    col = jax.lax.broadcasted_iota(jnp.int32, (r, n_pad), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (r, n_pad), 0) + i * r
    off_diag = (col != row).astype(jnp.float32)
    a_mask = off_diag * valid * row_valid
    p_mask = (labels == row_labels).astype(jnp.float32) * a_mask
    return a_mask, p_mask


# ------------------------------------------------------------------ forward kernel
def _fwd_kernel(scalar_ref, z_ref, zrow_ref, lab_ref, labrow_ref, val_ref, valrow_ref,
                rowloss_ref, c_ref, denom_ref, a_ref, spsum_ref, ppos_ref,
                *, mode: str, n_pad: int):
    """One row strip: [R, 2N] similarities -> per-row stats.

    scalar_ref (SMEM): [inv_t, gamma]. z_ref [2N, D] full; zrow_ref [R, D]
    this block's rows; lab/val full [1, 2N]; labrow/valrow this block [1, R].
    """
    i = pl.program_id(0)
    inv_t = scalar_ref[0]
    gamma = scalar_ref[1]
    r = zrow_ref.shape[0]

    s = jax.lax.dot_general(zrow_ref[:], z_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * inv_t - inv_t

    a_mask, p_mask = _masks(r, n_pad, i, lab_ref[0, :][None, :],
                            labrow_ref[0, :][:, None],
                            val_ref[0, :][None, :], valrow_ref[0, :][:, None])

    # mask in log space BEFORE exp: padded columns may hold arbitrary
    # (un-normalized) values whose exp would overflow to inf*0 = nan
    s_masked = jnp.where(a_mask > 0, s, _NEG_BIG)
    denom = jnp.sum(jnp.exp(s_masked), axis=1, keepdims=True)  # [R, 1]
    logp = s - jnp.log(denom + _EPS)

    if mode == "none":
        w = jnp.ones_like(logp)
    elif mode == "hard":
        w = (-logp <= gamma).astype(jnp.float32)
    else:  # soft
        w = jnp.maximum(1.0 + logp / gamma, 0.0)

    pw = p_mask * w
    c = jnp.sum(p_mask, axis=1, keepdims=True)
    c_safe = jnp.maximum(c, 1.0)
    rowloss_ref[:] = jnp.sum(pw * logp, axis=1, keepdims=True) / c_safe
    c_ref[:] = c
    denom_ref[:] = denom
    a_ref[:] = jnp.sum(pw, axis=1, keepdims=True) / c_safe
    spsum_ref[:] = jnp.sum(pw, axis=1, keepdims=True)
    ppos_ref[:] = c


def _bwd_kernel(scalar_ref, z_ref, zrow_ref, lab_ref, labrow_ref, val_ref, valrow_ref,
                c_ref, crow_ref, denom_ref, denomrow_ref, a_ref, arow_ref,
                dz_ref, *, mode: str, n_pad: int):
    """dz row strip: dz_i = sum_j (G_ij + G_ji) z_j / T.

    scalar_ref (SMEM): [inv_t, gamma, scale] where scale = g_out/(M*rho).
    c/denom/a come both as full [1, 2N] vectors (for the G_ji term) and as
    this block's [1, R] rows (for the G_ij term).
    """
    i = pl.program_id(0)
    inv_t = scalar_ref[0]
    gamma = scalar_ref[1]
    scale = scalar_ref[2]
    r = zrow_ref.shape[0]

    s = jax.lax.dot_general(zrow_ref[:], z_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * inv_t - inv_t

    valid = val_ref[0, :][None, :]
    row_valid = valrow_ref[0, :][:, None]
    a_mask, p_mask = _masks(r, n_pad, i, lab_ref[0, :][None, :],
                            labrow_ref[0, :][:, None], valid, row_valid)

    c_i = crow_ref[0, :][:, None]
    denom_i = denomrow_ref[0, :][:, None]
    a_i = arow_ref[0, :][:, None]
    m_i = (c_i > 0).astype(jnp.float32) * row_valid

    def weights(logp):
        if mode == "none":
            return jnp.ones_like(logp)
        if mode == "hard":
            return (-logp <= gamma).astype(jnp.float32)
        return jnp.maximum(1.0 + logp / gamma, 0.0)

    s_masked = jnp.where(a_mask > 0, s, _NEG_BIG)
    exp_s = jnp.exp(s_masked)

    # row-i term: G_ij
    logp_i = s - jnp.log(denom_i + _EPS)
    w_i = weights(logp_i)
    softmax_i = exp_s / (denom_i + _EPS)
    g_row = -(m_i * scale) * (p_mask * w_i / jnp.maximum(c_i, 1.0) - a_i * softmax_i)

    # column term: G_ji (symmetry of s; stats indexed by j)
    c_j = c_ref[0, :][None, :]
    denom_j = denom_ref[0, :][None, :]
    a_j = a_ref[0, :][None, :]
    m_j = (c_j > 0).astype(jnp.float32) * valid
    logp_j = s - jnp.log(denom_j + _EPS)
    w_j = weights(logp_j)
    softmax_j = exp_s / (denom_j + _EPS)
    g_col = -(m_j * scale) * (p_mask * w_j / jnp.maximum(c_j, 1.0) - a_j * softmax_j)

    g = (g_row + g_col) * inv_t
    dz_ref[:] = jax.lax.dot_general(g, z_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ host wrappers
def _full_vec_spec(n_pad):
    return pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _row_vec_spec():
    return pl.BlockSpec((1, _ROW_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)


def _base_specs(n_pad: int, d: int):
    grid = (n_pad // _ROW_BLOCK,)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                                # scalars
        pl.BlockSpec((n_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),  # z full
        pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM),  # z rows
        _full_vec_spec(n_pad), _row_vec_spec(),                               # labels
        _full_vec_spec(n_pad), _row_vec_spec(),                               # valid
    ]
    return grid, in_specs


def _fwd_stats(z, labels_f, valid_f, inv_t, gamma, mode):
    n_pad, d = z.shape
    grid, in_specs = _base_specs(n_pad, d)
    vec = jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
    out_specs = [pl.BlockSpec((_ROW_BLOCK, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 6
    kernel = functools.partial(_fwd_kernel, mode=mode, n_pad=n_pad)
    scalars = jnp.stack([inv_t, gamma]).astype(jnp.float32)
    lab = labels_f[None, :]
    val = valid_f[None, :]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=tuple(out_specs),
        out_shape=(vec,) * 6, interpret=_interpret(),
    )(scalars, z, z, lab, lab, val, val)


def _bwd_dz(z, labels_f, valid_f, c, denom, a, inv_t, gamma, scale, mode):
    n_pad, d = z.shape
    grid, in_specs = _base_specs(n_pad, d)
    in_specs = in_specs + [_full_vec_spec(n_pad), _row_vec_spec()] * 3
    out_spec = pl.BlockSpec((_ROW_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, mode=mode, n_pad=n_pad)
    scalars = jnp.stack([inv_t, gamma, scale]).astype(jnp.float32)
    lab = labels_f[None, :]
    val = valid_f[None, :]
    cv = c[:, 0][None, :]
    dv = denom[:, 0][None, :]
    av = a[:, 0][None, :]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=_interpret(),
    )(scalars, z, z, lab, lab, val, val, cv, cv, dv, dv, av, av)


def _prepare(z1, z2, target, valid):
    n, d = z1.shape
    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    t2 = jnp.concatenate([target, target]).astype(jnp.float32)
    if valid is None:
        v2 = jnp.ones((2 * n,), jnp.float32)
    else:
        v2 = jnp.concatenate([valid, valid]).astype(jnp.float32)
    n_pad = int(np.ceil(2 * n / _ROW_BLOCK) * _ROW_BLOCK)
    z = _pad_to(z, n_pad)
    t2 = _pad_to(t2, n_pad, value=-7.0)  # never equal to real labels with valid=0
    v2 = _pad_to(v2, n_pad, value=0.0)
    return z, t2, v2, n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(z1, z2, target, valid, gamma, inv_t, mode: str, correct_grad: bool):
    (loss, ratio), _ = _fused_fwd(z1, z2, target, valid, gamma, inv_t, mode, correct_grad)
    return loss, ratio


def _fused_fwd(z1, z2, target, valid, gamma, inv_t, mode: str, correct_grad: bool):
    z, t2, v2, _ = _prepare(z1, z2, target, valid)
    gamma = jnp.asarray(gamma, jnp.float32)
    inv_t = jnp.asarray(inv_t, jnp.float32)
    rowloss, c, denom, a, spsum, ppos = _fwd_stats(z, t2, v2, inv_t, gamma, mode)
    row_ok = ((c[:, 0] > 0) & (v2 > 0)).astype(jnp.float32)
    m = jnp.maximum(jnp.sum(row_ok), 1.0)
    loss_pre = -jnp.sum(rowloss[:, 0] * row_ok) / m
    ratio = jnp.sum(spsum[:, 0] * row_ok) / jnp.maximum(jnp.sum(ppos[:, 0] * row_ok), 1.0)
    if correct_grad and mode != "none":
        loss = jnp.where(ratio > 0, loss_pre / jnp.maximum(ratio, _EPS), loss_pre)
    else:
        loss = loss_pre
    residuals = (z, t2, v2, c, denom, a, m, ratio, gamma, inv_t, z1.shape[0])
    return (loss, ratio), residuals


def _fused_bwd(mode: str, correct_grad: bool, residuals, grads):
    g_loss, _ = grads  # no gradient flows through the ratio diagnostic
    z, t2, v2, c, denom, a, m, ratio, gamma, inv_t, n = residuals
    scale = g_loss / m
    if correct_grad and mode != "none":
        scale = jnp.where(ratio > 0, scale / jnp.maximum(ratio, _EPS), scale)
    dz = _bwd_dz(z, t2, v2, c, denom, a, inv_t, gamma, scale, mode)
    dz1 = dz[:n]
    dz2 = dz[n:2 * n]
    return dz1, dz2, None, None, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


# ------------------------------------------------------------------ public API
def fused_self_paced_supcon(z1: jnp.ndarray, z2: jnp.ndarray, *, gamma,
                            target: jnp.ndarray, valid: Optional[jnp.ndarray] = None,
                            temperature: float = 0.07, weight_update: str = "hard",
                            correct_grad: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused SelfPacedSupConLoss. Returns (loss, downgrade_ratio).

    Same semantics as losses.supcon.self_paced_supcon_loss.
    """
    assert weight_update in ("hard", "soft"), weight_update
    if valid is None:
        valid = jnp.ones((z1.shape[0],), jnp.float32)
    return _fused(z1, z2, target, valid, jnp.asarray(gamma, jnp.float32),
                  jnp.asarray(1.0 / float(temperature), jnp.float32),
                  weight_update, bool(correct_grad))


def fused_supcon(z1: jnp.ndarray, z2: jnp.ndarray, *, target: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None,
                 temperature: float = 0.07) -> jnp.ndarray:
    """Fused SupConLoss1 (no self-paced weighting). Returns loss."""
    if valid is None:
        valid = jnp.ones((z1.shape[0],), jnp.float32)
    loss, _ = _fused(z1, z2, target, valid, jnp.asarray(1e9, jnp.float32),
                     jnp.asarray(1.0 / float(temperature), jnp.float32),
                     "none", False)
    return loss
