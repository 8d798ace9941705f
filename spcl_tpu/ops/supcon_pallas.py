"""Fused blockwise Pallas kernel for the (self-paced) SupCon loss.

The reference materializes >=5 [2N,2N] tensors in HBM per loss call
(contrast_loss3.py:156-196: sim_exp, sim_logits, pos/neg masks, the
log-likelihood matrix, the self-paced mask). This kernel tiles over a
(row-block, col-block) grid instead — FlashAttention-style: per [R, C] tile
it computes the similarity block on the MXU, derives the pair masks ON THE
FLY from integer meta-label vectors, and accumulates per-row statistics
along the column (minor, sequential) grid axis. The [2N,2N] intermediates
never exist anywhere — not in HBM and not whole in VMEM.

Structure (the self-paced weight w(logp) needs the finished row denominator,
so the forward is two passes; both re-do the tile matmul, which is the usual
flash-style recompute trade):
  pass A: denom_i = sum_j exp(s_ij)  and  c_i = |P(i)|        (per row)
  pass B: rowloss_i = sum_j p_ij w_ij logp_ij,  spsum_i = sum_j p_ij w_ij
  bwd:    dz_i = sum_j (G_ij + G_ji) z_j / T  — G_ji computable from row
          stats of j because the similarity matrix is symmetric; single
          accumulating pass, wired up via jax.custom_vjp.

Math parity with losses/supcon.py (which is itself parity-tested against a
loop golden model): the max-subtraction constant is exactly 1/T because the
diagonal z.z = 1 is always present in the matrix (contrast_loss3.py:28-29).

Scaling: VMEM per grid step is O(R*D + C*D + R*C) — [128,D] + [512,D] +
[128,512] f32 ~ 1.1MB at D=256 — INDEPENDENT of 2N. z itself streams from
HBM tile by tile, so 2N is bounded by HBM, not VMEM (the round-1 kernel held
z [2N,D] whole in VMEM, capping 2N at ~8k). This is the global-batch piece
of the multi-chip design (SURVEY.md §5.7): all_gather the embeddings over
ICI, then this kernel runs at 2N = global batch.

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
_MAX_COL_BLOCK = 512
_EPS = 1e-16
_NEG_BIG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _col_block(n_pad: int) -> int:
    cb = _MAX_COL_BLOCK
    while n_pad % cb:
        cb //= 2
    return cb


def _pad_to(x: jnp.ndarray, n: int, value=0):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=value)


def _tile_masks(r, c, i, j, col_block, labels, row_labels, valid, row_valid):
    """Pair masks for tile (i, j): a_mask = valid off-diagonal pairs,
    p_mask = same-meta-label pairs within a_mask."""
    col = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1) + j * col_block
    row = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0) + i * r
    off_diag = (col != row).astype(jnp.float32)
    a_mask = off_diag * valid * row_valid
    p_mask = (labels == row_labels).astype(jnp.float32) * a_mask
    return a_mask, p_mask


def _tile_sim(zrow_ref, zcol_ref, inv_t):
    """[R, C] similarity tile: z_i . z_j / T - 1/T (global-max subtraction —
    the diagonal z.z = 1 is the max for L2-normalized rows)."""
    return jax.lax.dot_general(zrow_ref[:], zcol_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) * inv_t - inv_t


def _weights(logp, gamma, mode: str):
    if mode == "none":
        return jnp.ones_like(logp)
    if mode == "hard":
        return (-logp <= gamma).astype(jnp.float32)
    return jnp.maximum(1.0 + logp / gamma, 0.0)  # soft


# ------------------------------------------------------------------ forward kernels
def _denom_kernel(scalar_ref, zrow_ref, zcol_ref, labrow_ref, labcol_ref,
                  valrow_ref, valcol_ref, denom_ref, c_ref, *, col_block: int):
    """Pass A: accumulate the row softmax denominator and positive count."""
    i, j = pl.program_id(0), pl.program_id(1)
    inv_t = scalar_ref[0]
    r = zrow_ref.shape[0]
    s = _tile_sim(zrow_ref, zcol_ref, inv_t)
    a_mask, p_mask = _tile_masks(r, s.shape[1], i, j, col_block,
                                 labcol_ref[0, :][None, :], labrow_ref[0, :][:, None],
                                 valcol_ref[0, :][None, :], valrow_ref[0, :][:, None])
    # mask in log space BEFORE exp: padded columns may hold arbitrary
    # (un-normalized) values whose exp would overflow to inf*0 = nan
    exp_s = jnp.exp(jnp.where(a_mask > 0, s, _NEG_BIG))

    @pl.when(j == 0)
    def _init():
        denom_ref[:] = jnp.zeros_like(denom_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    denom_ref[:] += jnp.sum(exp_s, axis=1, keepdims=True)
    c_ref[:] += jnp.sum(p_mask, axis=1, keepdims=True)


def _loss_kernel(scalar_ref, zrow_ref, zcol_ref, labrow_ref, labcol_ref,
                 valrow_ref, valcol_ref, denomrow_ref, rawloss_ref, spsum_ref,
                 *, mode: str, col_block: int):
    """Pass B: accumulate sum_j p w logp and sum_j p w using the finished
    row denominators."""
    i, j = pl.program_id(0), pl.program_id(1)
    inv_t = scalar_ref[0]
    gamma = scalar_ref[1]
    r = zrow_ref.shape[0]
    s = _tile_sim(zrow_ref, zcol_ref, inv_t)
    _, p_mask = _tile_masks(r, s.shape[1], i, j, col_block,
                            labcol_ref[0, :][None, :], labrow_ref[0, :][:, None],
                            valcol_ref[0, :][None, :], valrow_ref[0, :][:, None])
    denom_i = denomrow_ref[0, :][:, None]
    logp = s - jnp.log(denom_i + _EPS)
    pw = p_mask * _weights(logp, gamma, mode)

    @pl.when(j == 0)
    def _init():
        rawloss_ref[:] = jnp.zeros_like(rawloss_ref)
        spsum_ref[:] = jnp.zeros_like(spsum_ref)

    rawloss_ref[:] += jnp.sum(pw * logp, axis=1, keepdims=True)
    spsum_ref[:] += jnp.sum(pw, axis=1, keepdims=True)


# ------------------------------------------------------------------ backward kernel
def _bwd_kernel(scalar_ref, zrow_ref, zcol_ref, labrow_ref, labcol_ref,
                valrow_ref, valcol_ref, crow_ref, ccol_ref, denomrow_ref,
                denomcol_ref, arow_ref, acol_ref, dz_ref, *, mode: str, col_block: int):
    """dz row strip, accumulated over column tiles:
    dz_i += (G_ij + G_ji) @ z_cols / T."""
    i, j = pl.program_id(0), pl.program_id(1)
    inv_t = scalar_ref[0]
    gamma = scalar_ref[1]
    scale = scalar_ref[2]
    r = zrow_ref.shape[0]
    s = _tile_sim(zrow_ref, zcol_ref, inv_t)

    valid = valcol_ref[0, :][None, :]
    row_valid = valrow_ref[0, :][:, None]
    a_mask, p_mask = _tile_masks(r, s.shape[1], i, j, col_block,
                                 labcol_ref[0, :][None, :], labrow_ref[0, :][:, None],
                                 valid, row_valid)
    exp_s = jnp.exp(jnp.where(a_mask > 0, s, _NEG_BIG))

    # row-i term: G_ij
    c_i = crow_ref[0, :][:, None]
    denom_i = denomrow_ref[0, :][:, None]
    a_i = arow_ref[0, :][:, None]
    m_i = (c_i > 0).astype(jnp.float32) * row_valid
    logp_i = s - jnp.log(denom_i + _EPS)
    w_i = _weights(logp_i, gamma, mode)
    softmax_i = exp_s / (denom_i + _EPS)
    g_row = -(m_i * scale) * (p_mask * w_i / jnp.maximum(c_i, 1.0) - a_i * softmax_i)

    # column term: G_ji (symmetry of s; stats indexed by j)
    c_j = ccol_ref[0, :][None, :]
    denom_j = denomcol_ref[0, :][None, :]
    a_j = acol_ref[0, :][None, :]
    m_j = (c_j > 0).astype(jnp.float32) * valid
    logp_j = s - jnp.log(denom_j + _EPS)
    w_j = _weights(logp_j, gamma, mode)
    softmax_j = exp_s / (denom_j + _EPS)
    g_col = -(m_j * scale) * (p_mask * w_j / jnp.maximum(c_j, 1.0) - a_j * softmax_j)

    g = (g_row + g_col) * inv_t

    @pl.when(j == 0)
    def _init():
        dz_ref[:] = jnp.zeros_like(dz_ref)

    dz_ref[:] += jax.lax.dot_general(g, zcol_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ host wrappers
def _grid_and_specs(n_pad: int, d: int):
    cb = _col_block(n_pad)
    grid = (n_pad // _ROW_BLOCK, n_pad // cb)
    base = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                                      # scalars
        pl.BlockSpec((_ROW_BLOCK, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),  # z rows
        pl.BlockSpec((cb, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),          # z cols
        pl.BlockSpec((1, _ROW_BLOCK), lambda i, j: (0, i), memory_space=pltpu.VMEM),  # lab rows
        pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM),          # lab cols
        pl.BlockSpec((1, _ROW_BLOCK), lambda i, j: (0, i), memory_space=pltpu.VMEM),  # val rows
        pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM),          # val cols
    ]
    row_vec_out = pl.BlockSpec((_ROW_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    row_vec_in = pl.BlockSpec((1, _ROW_BLOCK), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM)
    col_vec_in = pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    return cb, grid, base, row_vec_out, row_vec_in, col_vec_in


def _fwd_stats(z, labels_f, valid_f, inv_t, gamma, mode):
    n_pad, d = z.shape
    cb, grid, base, row_out, row_in, _ = _grid_and_specs(n_pad, d)
    vec = jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
    scalars = jnp.stack([inv_t, gamma]).astype(jnp.float32)
    lab = labels_f[None, :]
    val = valid_f[None, :]

    denom, c = pl.pallas_call(
        functools.partial(_denom_kernel, col_block=cb),
        grid=grid, in_specs=base, out_specs=(row_out, row_out),
        out_shape=(vec, vec), interpret=_interpret(),
    )(scalars, z, z, lab, lab, val, val)

    rawloss, spsum = pl.pallas_call(
        functools.partial(_loss_kernel, mode=mode, col_block=cb),
        grid=grid, in_specs=base + [row_in], out_specs=(row_out, row_out),
        out_shape=(vec, vec), interpret=_interpret(),
    )(scalars, z, z, lab, lab, val, val, denom[:, 0][None, :])

    c_safe = jnp.maximum(c, 1.0)
    rowloss = rawloss / c_safe
    a = spsum / c_safe
    return rowloss, c, denom, a, spsum, c


def _bwd_dz(z, labels_f, valid_f, c, denom, a, inv_t, gamma, scale, mode):
    n_pad, d = z.shape
    cb, grid, base, _, row_in, col_in = _grid_and_specs(n_pad, d)
    out_spec = pl.BlockSpec((_ROW_BLOCK, d), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    scalars = jnp.stack([inv_t, gamma, scale]).astype(jnp.float32)
    lab = labels_f[None, :]
    val = valid_f[None, :]
    cv = c[:, 0][None, :]
    dv = denom[:, 0][None, :]
    av = a[:, 0][None, :]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, mode=mode, col_block=cb),
        grid=grid, in_specs=base + [row_in, col_in] * 3, out_specs=out_spec,
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
