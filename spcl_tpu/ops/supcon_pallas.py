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
  bwd:    dz_i = sum_j (G_ij + G_ji) z_j / T — G_ji computable from row
          stats of j because the similarity matrix is symmetric; single
          accumulating pass, wired up via jax.custom_vjp.

Every kernel runs over an INDEPENDENT (rows x cols) rectangle: rows and
columns carry their own z/label/valid arrays plus explicit global-row-id
vectors for diagonal masking. The replicated path uses the same array for
both sides; the ROW-SHARDED path (sharded_fused_self_paced_supcon, the
multi-chip form of SURVEY §5.7) gives each chip only its [2n_local, 2N] row
strip: columns are the all_gather'ed global batch, the scalar reductions
combine with one psum, and the backward folds each row's column-term in via
symmetry after an all_gather of the tiny per-row stats vectors — per-chip
compute and HBM traffic drop by the mesh size while gradients stay exact
(tests/test_parallel_fused.py).

Math parity with losses/supcon.py (which is itself parity-tested against a
loop golden model): the max-subtraction constant is exactly 1/T because the
diagonal z.z = 1 is always present in the matrix (contrast_loss3.py:28-29) —
and every row STRIP contains its own diagonal, so this holds shard-locally.

Scaling: VMEM per grid step is O(R*D + C*D + R*C) — [128,D] + [512,D] +
[128,512] f32 ~ 1.1MB at D=256 — INDEPENDENT of 2N. z itself streams from
HBM tile by tile, so 2N is bounded by HBM, not VMEM (the round-1 kernel held
z [2N,D] whole in VMEM, capping 2N at ~8k). This is the global-batch piece
of the multi-chip design (SURVEY.md §5.7): all_gather the embeddings over
ICI, then the strip kernels run at 2N = global batch.

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


def _tile_masks(gid_rows, gid_cols, labels, row_labels, valid, row_valid):
    """Pair masks for one tile: a_mask = valid off-diagonal pairs, p_mask =
    same-meta-label pairs within a_mask. gid_* are GLOBAL row ids ([R,1] /
    [1,C] f32): the diagonal is gid equality, which stays correct when the
    rows are a strip of the global matrix (pad ids are distinct negatives)."""
    off_diag = (gid_cols != gid_rows).astype(jnp.float32)
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


def _unpack_sides(refs):
    """Common kernel operand order -> (named dict). Order: z rows, z cols,
    lab rows, lab cols, val rows, val cols, gid rows, gid cols."""
    (zrow_ref, zcol_ref, labrow_ref, labcol_ref, valrow_ref, valcol_ref,
     gidrow_ref, gidcol_ref) = refs
    return dict(
        zrow=zrow_ref, zcol=zcol_ref,
        labr=labrow_ref[0, :][:, None], labc=labcol_ref[0, :][None, :],
        valr=valrow_ref[0, :][:, None], valc=valcol_ref[0, :][None, :],
        gidr=gidrow_ref[0, :][:, None], gidc=gidcol_ref[0, :][None, :])


# ------------------------------------------------------------------ forward kernels
def _denom_kernel(scalar_ref, *refs):
    """Pass A: accumulate the row softmax denominator and positive count."""
    side, (denom_ref, c_ref) = _unpack_sides(refs[:8]), refs[8:]
    j = pl.program_id(1)
    inv_t = scalar_ref[0]
    s = _tile_sim(side["zrow"], side["zcol"], inv_t)
    a_mask, p_mask = _tile_masks(side["gidr"], side["gidc"], side["labc"],
                                 side["labr"], side["valc"], side["valr"])
    # mask in log space BEFORE exp: padded columns may hold arbitrary
    # (un-normalized) values whose exp would overflow to inf*0 = nan
    exp_s = jnp.exp(jnp.where(a_mask > 0, s, _NEG_BIG))

    @pl.when(j == 0)
    def _init():
        denom_ref[:] = jnp.zeros_like(denom_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    denom_ref[:] += jnp.sum(exp_s, axis=1, keepdims=True)
    c_ref[:] += jnp.sum(p_mask, axis=1, keepdims=True)


def _loss_kernel(scalar_ref, *refs, mode: str):
    """Pass B: accumulate sum_j p w logp and sum_j p w using the finished
    row denominators."""
    side = _unpack_sides(refs[:8])
    denomrow_ref, rawloss_ref, spsum_ref = refs[8:]
    j = pl.program_id(1)
    inv_t = scalar_ref[0]
    gamma = scalar_ref[1]
    s = _tile_sim(side["zrow"], side["zcol"], inv_t)
    _, p_mask = _tile_masks(side["gidr"], side["gidc"], side["labc"],
                            side["labr"], side["valc"], side["valr"])
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
def _bwd_kernel(scalar_ref, *refs, mode: str):
    """dz row strip, accumulated over column tiles:
    dz_i += (G_ij + G_ji) @ z_cols / T. Row stats (c/denom/a) are the strip's
    own; column stats are the GLOBAL per-row stats of the columns, so the
    symmetric G_ji term is exact even when rows are a shard's strip."""
    side = _unpack_sides(refs[:8])
    (crow_ref, ccol_ref, denomrow_ref, denomcol_ref, arow_ref, acol_ref,
     dz_ref) = refs[8:]
    j = pl.program_id(1)
    inv_t = scalar_ref[0]
    gamma = scalar_ref[1]
    scale = scalar_ref[2]
    s = _tile_sim(side["zrow"], side["zcol"], inv_t)

    a_mask, p_mask = _tile_masks(side["gidr"], side["gidc"], side["labc"],
                                 side["labr"], side["valc"], side["valr"])
    exp_s = jnp.exp(jnp.where(a_mask > 0, s, _NEG_BIG))

    # row-i term: G_ij
    c_i = crow_ref[0, :][:, None]
    denom_i = denomrow_ref[0, :][:, None]
    a_i = arow_ref[0, :][:, None]
    m_i = (c_i > 0).astype(jnp.float32) * side["valr"]
    logp_i = s - jnp.log(denom_i + _EPS)
    w_i = _weights(logp_i, gamma, mode)
    softmax_i = exp_s / (denom_i + _EPS)
    g_row = -(m_i * scale) * (p_mask * w_i / jnp.maximum(c_i, 1.0) - a_i * softmax_i)

    # column term: G_ji (symmetry of s; stats indexed by j)
    c_j = ccol_ref[0, :][None, :]
    denom_j = denomcol_ref[0, :][None, :]
    a_j = acol_ref[0, :][None, :]
    m_j = (c_j > 0).astype(jnp.float32) * side["valc"]
    logp_j = s - jnp.log(denom_j + _EPS)
    w_j = _weights(logp_j, gamma, mode)
    softmax_j = exp_s / (denom_j + _EPS)
    g_col = -(m_j * scale) * (p_mask * w_j / jnp.maximum(c_j, 1.0) - a_j * softmax_j)

    g = (g_row + g_col) * inv_t

    @pl.when(j == 0)
    def _init():
        dz_ref[:] = jnp.zeros_like(dz_ref)

    dz_ref[:] += jax.lax.dot_general(g, side["zcol"][:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


# ------------------------------------------------------------------ host wrappers
def _grid_and_specs(rows_pad: int, cols_pad: int, d: int):
    cb = _col_block(cols_pad)
    grid = (rows_pad // _ROW_BLOCK, cols_pad // cb)
    row_vec_in = pl.BlockSpec((1, _ROW_BLOCK), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM)
    col_vec_in = pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    base = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                                      # scalars
        pl.BlockSpec((_ROW_BLOCK, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),  # z rows
        pl.BlockSpec((cb, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),          # z cols
        row_vec_in,   # lab rows
        col_vec_in,   # lab cols
        row_vec_in,   # val rows
        col_vec_in,   # val cols
        row_vec_in,   # gid rows
        col_vec_in,   # gid cols
    ]
    row_vec_out = pl.BlockSpec((_ROW_BLOCK, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    return cb, grid, base, row_vec_out, row_vec_in, col_vec_in


def _fwd_stats(zr, zc, lab_r, lab_c, val_r, val_c, gid_r, gid_c,
               inv_t, gamma, mode):
    """Strip forward: per-ROW denom / positive-count / raw loss / sp-sum over
    the (rows x cols) rectangle. All row-vector operands ship as [1, n]."""
    rows_pad, d = zr.shape
    cols_pad = zc.shape[0]
    cb, grid, base, row_out, row_in, _ = _grid_and_specs(rows_pad, cols_pad, d)
    vec = jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32)
    scalars = jnp.stack([inv_t, gamma]).astype(jnp.float32)
    ins = (scalars, zr, zc, lab_r[None, :], lab_c[None, :],
           val_r[None, :], val_c[None, :], gid_r[None, :], gid_c[None, :])

    denom, c = pl.pallas_call(
        _denom_kernel,
        grid=grid, in_specs=base, out_specs=(row_out, row_out),
        out_shape=(vec, vec), interpret=_interpret(),
    )(*ins)

    rawloss, spsum = pl.pallas_call(
        functools.partial(_loss_kernel, mode=mode),
        grid=grid, in_specs=base + [row_in], out_specs=(row_out, row_out),
        out_shape=(vec, vec), interpret=_interpret(),
    )(*ins, denom[:, 0][None, :])

    c_safe = jnp.maximum(c, 1.0)
    rowloss = rawloss / c_safe
    a = spsum / c_safe
    return rowloss, c, denom, a, spsum


def _bwd_dz(zr, zc, lab_r, lab_c, val_r, val_c, gid_r, gid_c,
            c_r, c_c, denom_r, denom_c, a_r, a_c, inv_t, gamma, scale, mode):
    """Strip backward: dz for the ROW side. c/denom/a_r are the strip rows'
    stats; *_c are the GLOBAL stats of the column entries ([cols_pad])."""
    rows_pad, d = zr.shape
    cols_pad = zc.shape[0]
    cb, grid, base, _, row_in, col_in = _grid_and_specs(rows_pad, cols_pad, d)
    out_spec = pl.BlockSpec((_ROW_BLOCK, d), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    scalars = jnp.stack([inv_t, gamma, scale]).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, mode=mode),
        grid=grid, in_specs=base + [row_in, col_in] * 3, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), jnp.float32),
        interpret=_interpret(),
    )(scalars, zr, zc, lab_r[None, :], lab_c[None, :], val_r[None, :],
      val_c[None, :], gid_r[None, :], gid_c[None, :],
      c_r[None, :], c_c[None, :], denom_r[None, :], denom_c[None, :],
      a_r[None, :], a_c[None, :])


def _prepare(z1, z2, target, valid, block=_ROW_BLOCK):
    """concat views, cast, right-pad to a `block` multiple. Pad rows carry
    label -7 (never equal to a real label), valid 0, and a distinct negative
    gid per entry (no pad-pad diagonal hits)."""
    n = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    t2 = jnp.concatenate([target, target]).astype(jnp.float32)
    if valid is None:
        v2 = jnp.ones((2 * n,), jnp.float32)
    else:
        v2 = jnp.concatenate([valid, valid]).astype(jnp.float32)
    n_pad = int(np.ceil(2 * n / block) * block)
    z = _pad_to(z, n_pad)
    t2 = _pad_to(t2, n_pad, value=-7.0)
    v2 = _pad_to(v2, n_pad, value=0.0)
    return z, t2, v2, n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(z1, z2, target, valid, gamma, inv_t, mode: str, correct_grad: bool):
    (loss, ratio), _ = _fused_fwd(z1, z2, target, valid, gamma, inv_t, mode, correct_grad)
    return loss, ratio


def _fused_fwd(z1, z2, target, valid, gamma, inv_t, mode: str, correct_grad: bool):
    z, t2, v2, n_pad = _prepare(z1, z2, target, valid)
    gamma = jnp.asarray(gamma, jnp.float32)
    inv_t = jnp.asarray(inv_t, jnp.float32)
    gid = jnp.arange(n_pad, dtype=jnp.float32)
    rowloss, c, denom, a = _square_stats(z, t2, v2, gid, inv_t, gamma, mode)
    row_ok = ((c[:, 0] > 0) & (v2 > 0)).astype(jnp.float32)
    m = jnp.maximum(jnp.sum(row_ok), 1.0)
    loss_pre = -jnp.sum(rowloss[:, 0] * row_ok) / m
    spsum = a * jnp.maximum(c, 1.0)
    ratio = jnp.sum(spsum[:, 0] * row_ok) / jnp.maximum(jnp.sum(c[:, 0] * row_ok), 1.0)
    if correct_grad and mode != "none":
        loss = jnp.where(ratio > 0, loss_pre / jnp.maximum(ratio, _EPS), loss_pre)
    else:
        loss = loss_pre
    residuals = (z, t2, v2, c, denom, a, m, ratio, gamma, inv_t, z1.shape[0])
    return (loss, ratio), residuals


def _square_stats(z, t2, v2, gid, inv_t, gamma, mode):
    rowloss, c, denom, a, _ = _fwd_stats(z, z, t2, t2, v2, v2, gid, gid,
                                         inv_t, gamma, mode)
    return rowloss, c, denom, a


def _fused_bwd(mode: str, correct_grad: bool, residuals, grads):
    g_loss, _ = grads  # no gradient flows through the ratio diagnostic
    z, t2, v2, c, denom, a, m, ratio, gamma, inv_t, n = residuals
    scale = g_loss / m
    if correct_grad and mode != "none":
        scale = jnp.where(ratio > 0, scale / jnp.maximum(ratio, _EPS), scale)
    gid = jnp.arange(z.shape[0], dtype=jnp.float32)
    cv, dv, av = c[:, 0], denom[:, 0], a[:, 0]
    dz = _bwd_dz(z, z, t2, t2, v2, v2, gid, gid, cv, cv, dv, dv, av, av,
                 inv_t, gamma, scale, mode)
    dz1 = dz[:n]
    dz2 = dz[n:2 * n]
    return dz1, dz2, None, None, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


# ------------------------------------------------------------------ sharded (row-strip)
def _strip_prepare(z1, z2, target, valid, tg, vg, row_off, n_global):
    """Row strip (local) + column (global) operands, padded for the kernels.

    Local rows r map to global ids row_off + r (first view half) and
    n_global + row_off + r (second half); pad rows/cols get distinct
    negative ids so no spurious diagonal forms."""
    n_l = z1.shape[0]
    zr, tr, vr, rows_pad = _prepare(z1, z2, target, valid)
    half = jnp.arange(n_l, dtype=jnp.float32)
    gid_r = _pad_to(jnp.concatenate([row_off + half, n_global + row_off + half]),
                    rows_pad, value=-1.0)

    cols = 2 * n_global
    cols_pad = int(np.ceil(cols / _ROW_BLOCK) * _ROW_BLOCK)
    # columns arrive pre-concatenated ([2N, D] z, [2N] labels/valid)
    zc = _pad_to(tg["z"].astype(jnp.float32), cols_pad)
    tc = _pad_to(tg["t"].astype(jnp.float32), cols_pad, value=-7.0)
    vc = _pad_to(vg.astype(jnp.float32), cols_pad, value=0.0)
    gid_c = jnp.where(jnp.arange(cols_pad) < cols,
                      jnp.arange(cols_pad, dtype=jnp.float32), -2.0)
    return (zr, tr, vr, gid_r, rows_pad), (zc, tc, vc, gid_c, cols_pad)


def _gather_cols(z1, z2, target, valid, axis_name):
    zg1 = jax.lax.all_gather(z1, axis_name, tiled=True)
    zg2 = jax.lax.all_gather(z2, axis_name, tiled=True)
    tg = jax.lax.all_gather(target, axis_name, tiled=True)
    vg = jax.lax.all_gather(valid, axis_name, tiled=True)
    z = jnp.concatenate([zg1, zg2], axis=0)
    t = jnp.concatenate([tg, tg])
    v = jnp.concatenate([vg, vg])
    return {"z": z, "t": t}, v, zg1.shape[0]


def _gather_row_stats(vec_local, n_l, rows_pad_cols, axis_name):
    """[rows_pad_local, 1] per-LOCAL-row stats -> [cols_pad] global vector in
    global row order (first-view halves of every shard, then second-view
    halves), padded to the column padding."""
    v = vec_local[:, 0]
    h1 = jax.lax.all_gather(v[:n_l], axis_name, tiled=True)
    h2 = jax.lax.all_gather(v[n_l:2 * n_l], axis_name, tiled=True)
    return _pad_to(jnp.concatenate([h1, h2]), rows_pad_cols)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _sharded_fused(z1, z2, target, valid, gamma, inv_t, mode: str,
                   correct_grad: bool, axis_name: str):
    (loss, ratio), _ = _sharded_fused_fwd(z1, z2, target, valid, gamma, inv_t,
                                          mode, correct_grad, axis_name)
    return loss, ratio


def _sharded_fused_fwd(z1, z2, target, valid, gamma, inv_t, mode: str,
                       correct_grad: bool, axis_name: str):
    gamma = jnp.asarray(gamma, jnp.float32)
    inv_t = jnp.asarray(inv_t, jnp.float32)
    n_l = z1.shape[0]
    cols, vg, n_global = _gather_cols(z1, z2, target, valid, axis_name)
    row_off = (jax.lax.axis_index(axis_name) * n_l).astype(jnp.float32)
    (zr, tr, vr, gid_r, rows_pad), (zc, tc, vc, gid_c, cols_pad) = \
        _strip_prepare(z1, z2, target, valid, cols, vg, row_off, n_global)

    rowloss, c, denom, a, spsum = _fwd_stats(
        zr, zc, tr, tc, vr, vc, gid_r, gid_c, inv_t, gamma, mode)
    row_ok = ((c[:, 0] > 0) & (vr > 0)).astype(jnp.float32)
    # one psum combines every cross-shard scalar reduction
    parts = jax.lax.psum(jnp.stack([
        jnp.sum(rowloss[:, 0] * row_ok), jnp.sum(row_ok),
        jnp.sum(spsum[:, 0] * row_ok), jnp.sum(c[:, 0] * row_ok)]), axis_name)
    m = jnp.maximum(parts[1], 1.0)
    loss_pre = -parts[0] / m
    ratio = parts[2] / jnp.maximum(parts[3], 1.0)
    if correct_grad and mode != "none":
        loss = jnp.where(ratio > 0, loss_pre / jnp.maximum(ratio, _EPS), loss_pre)
    else:
        loss = loss_pre
    # global per-row stats of the COLUMN entries, for the symmetric G_ji
    # term of the backward ([2N]-sized vectors — tiny vs the [2N, D] gather)
    c_g = _gather_row_stats(c, n_l, cols_pad, axis_name)
    denom_g = _gather_row_stats(denom, n_l, cols_pad, axis_name)
    a_g = _gather_row_stats(a, n_l, cols_pad, axis_name)
    residuals = ((zr, tr, vr, gid_r), (zc, tc, vc, gid_c),
                 (c[:, 0], denom[:, 0], a[:, 0]), (c_g, denom_g, a_g),
                 m, ratio, gamma, inv_t, n_l)
    return (loss, ratio), residuals


def _sharded_fused_bwd(mode: str, correct_grad: bool, axis_name: str,
                       residuals, grads):
    g_loss, _ = grads
    (rows, colsops, stats_l, stats_g, m, ratio, gamma, inv_t, n_l) = residuals
    zr, tr, vr, gid_r = rows
    zc, tc, vc, gid_c = colsops
    c_l, denom_l, a_l = stats_l
    c_g, denom_g, a_g = stats_g
    # shard_map splits the cotangent of an unmapped (replicated) output so
    # that a psum recovers it — exactly what the fwd's psum-transpose would
    # do. The custom_vjp replaces that transpose, so recover it explicitly;
    # dz then folds each local row's row-term AND column-term (via symmetry
    # with the global column stats) — no cross-shard grad traffic beyond it.
    g_loss = jax.lax.psum(g_loss, axis_name)
    scale = g_loss / m
    if correct_grad and mode != "none":
        scale = jnp.where(ratio > 0, scale / jnp.maximum(ratio, _EPS), scale)
    dz = _bwd_dz(zr, zc, tr, tc, vr, vc, gid_r, gid_c,
                 c_l, c_g, denom_l, denom_g, a_l, a_g,
                 inv_t, gamma, scale, mode)
    return dz[:n_l], dz[n_l:2 * n_l], None, None, None, None


_sharded_fused.defvjp(_sharded_fused_fwd, _sharded_fused_bwd)


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


def sharded_fused_self_paced_supcon(z1_shard, z2_shard, target_shard, valid_shard,
                                    *, gamma, axis_name: str = "data",
                                    temperature: float = 0.07,
                                    weight_update: str = "soft",
                                    correct_grad: bool = False
                                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ROW-SHARDED fused SelfPacedSupConLoss — SURVEY §5.7's scalable form
    composed with the blockwise kernel. Must run inside shard_map (or pmap)
    with `axis_name` bound; per-shard inputs are [n_local, D] / [n_local].
    Each chip computes only its [2n_local, 2N] strip of the similarity
    matrix; returns (loss, ratio), identical on every shard and equal to the
    single-device loss on the gathered batch.

    weight_update="none" degrades to plain SupCon (fused_supcon semantics).
    """
    assert weight_update in ("hard", "soft", "none"), weight_update
    return _sharded_fused(z1_shard, z2_shard, target_shard,
                          valid_shard.astype(jnp.float32),
                          jnp.asarray(gamma, jnp.float32),
                          jnp.asarray(1.0 / float(temperature), jnp.float32),
                          weight_update, bool(correct_grad), axis_name)
