"""Fused lane-packed ConvBlock stages (Pallas) — the UNet stage-1/2 kernels.

Round-3 device profiling: the two small-C encoder stages cost 12.9 of the
17.3 ms bf16 pretrain step. For C < 128 NHWC tensors XLA lays the BATCH into
the 128-wide lanes (2N=60 -> 2.13x padded HBM traffic on every stage
tensor); a logical-NCHW rewrite measures identical and a pure-jnp
lane-packed rewrite loses to layout copies (benchmarks/step_ops_r3.json). These
kernels run the validated lane-packed formulation (experimental/packed_stage.py:
activations [B, H, Wg, 128] = G=128/C columns x C channels per lane group;
3x3 convs as nine dense banded 128x128 matmuls) INSIDE Pallas where the
memory plan is explicit: one read + one write per plane, full lanes, no
relayouts.

Grid = batch; one padded image plane per step (stage-1: [226, 30, 128] bf16
= 1.7 MB, VMEM-resident). BatchNorm must see global batch statistics before
normalizing, so the stage splits at each BN:

  fwd  K_conv:    zpad = conv(xpad)            + lane sums (Sz, Szz)
       K_bnconv:  z1pad = conv(relu(bn(zpad))) + lane sums
       K_bnpool:  e = relu(bn(z1)); p = maxpool2x2(e)
  bwd  K_poolsums: dy1 = (poolbwd(dp)+de) * relu'  -> (S_dy, S_dyz)
       K_dz:      dz1 = bnbwd(dy1) via coef; dBands1 += a0^T dz1;
                  dy0 = (conv1^T dz1) * relu'0      -> (S_dy0, S_dy0z0)
       K_dwdx:    dz0 = bnbwd(dy0) via coef; dBands0 += x^T dz0;
                  [dx = conv0^T dz0]

Weight gradients come out as banded-matrix cotangents; the chain back to
the ordinary [3,3,Ci,Co] kernels is jax.vjp of the band construction
(experimental/packed_stage._band_matrices) — no hand-derived index math.
Equivalence-tested against the jnp packed/NHWC paths; interpret mode on CPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed_stage import _band_matrices


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------- in-kernel ops
def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bn(z, inv, shift):
    return z.astype(jnp.float32) * inv + shift


def _pool_perms(c):
    """Static lane-permutation matrices for the 2x2 pool: even/odd column
    compaction of an input-group PAIR into one output group (low/high 64
    lanes). Lane (o, ci); max is non-linear so the perms only MOVE data."""
    import numpy as _np
    g = 128 // c
    pe_lo = _np.zeros((128, 128), _np.float32)
    po_lo = _np.zeros((128, 128), _np.float32)
    pe_hi = _np.zeros((128, 128), _np.float32)
    po_hi = _np.zeros((128, 128), _np.float32)
    half = (g // 2) * c
    for o in range(g):
        for ci in range(c):
            if o % 2 == 0:
                pe_lo[o * c + ci, (o // 2) * c + ci] = 1.0
                pe_hi[o * c + ci, half + (o // 2) * c + ci] = 1.0
            else:
                po_lo[o * c + ci, (o // 2) * c + ci] = 1.0
                po_hi[o * c + ci, half + (o // 2) * c + ci] = 1.0
    return pe_lo, po_lo, pe_hi, po_hi


def _pool_cands(e, perms, h, wg, c, dtype):
    """Four 2x2-window candidates on the pooled grid, scan order
    (r0,colE),(r0,colO),(r1,colE),(r1,colO). e [H, Wg, 128], perms
    [4,128,128] (pe_lo, po_lo, pe_hi, po_hi) -> candidates [H/2, Wg/2, 128]."""
    pe_lo, po_lo, pe_hi, po_hi = perms[0], perms[1], perms[2], perms[3]
    er = e.reshape(h // 2, 2, wg // 2, 2, 128)
    out = []
    for row in (0, 1):
        a = er[:, row, :, 0, :].reshape(h // 2 * (wg // 2), 128).astype(dtype)
        b = er[:, row, :, 1, :].reshape(h // 2 * (wg // 2), 128).astype(dtype)
        ce = (_dot(a, pe_lo.astype(dtype)) + _dot(b, pe_hi.astype(dtype)))
        co = (_dot(a, po_lo.astype(dtype)) + _dot(b, po_hi.astype(dtype)))
        out.append(ce.reshape(h // 2, wg // 2, 128))
        out.append(co.reshape(h // 2, wg // 2, 128))
    return out  # [c0E, c0O, c1E, c1O] as f32


def _pool(e, perms, h, wg, c):
    c0e, c0o, c1e, c1o = _pool_cands(e, perms, h, wg, c, e.dtype)
    return jnp.maximum(jnp.maximum(c0e, c0o),
                       jnp.maximum(c1e, c1o)).astype(e.dtype)


def _pool_bwd(e, dp, perms, h, wg, c):
    """Route dp to the FIRST max of each 2x2 window (scan order — torch),
    scattering back through the transposed permutation matmuls."""
    pe_lo, po_lo, pe_hi, po_hi = perms[0], perms[1], perms[2], perms[3]
    cands = _pool_cands(e, perms, h, wg, c, e.dtype)
    m = jnp.maximum(jnp.maximum(cands[0], cands[1]),
                    jnp.maximum(cands[2], cands[3]))
    dpf = dp.astype(jnp.float32)
    taken = jnp.zeros_like(m, dtype=jnp.bool_)
    routed = []
    for cand in cands:
        sel = (cand == m) & ~taken
        taken = taken | sel
        routed.append(jnp.where(sel, dpf, 0.0))
    n2 = (h // 2) * (wg // 2)
    rows = []
    for row in (0, 1):
        de = routed[2 * row].reshape(n2, 128)
        do = routed[2 * row + 1].reshape(n2, 128)
        da = (_dot(de, pe_lo.T) + _dot(do, po_lo.T))
        db = (_dot(de, pe_hi.T) + _dot(do, po_hi.T))
        pair = jnp.stack([da.reshape(h // 2, wg // 2, 128),
                          db.reshape(h // 2, wg // 2, 128)], axis=2)
        rows.append(pair.reshape(h // 2, wg, 128))
    both = jnp.stack(rows, axis=1)                       # [H/2, 2, Wg, 128]
    return both.reshape(h, wg, 128)


def _interior(pad_ref, h, wg):
    return pad_ref[0][1:1 + h, 1:1 + wg, :]


def _repad(z):
    return jnp.pad(z, ((1, 1), (1, 1), (0, 0)))


# --------------------------------------------------------------------- kernels
# Every kernel fori_loops over row-strips with dynamic pl.ds ref indexing:
# strip temporaries stay ~1MB (under the ~16MB/core VMEM budget that whole
# [224, 30, 128] f32 planes blow) and the MLIR stays small (a fully unrolled
# strip loop at 28 strips made the remote compiler OOM).


def _strips(h, wg=None, budget_bytes=5 * 1024 * 1024, row_factor=8):
    """Smallest strip count dividing h with an EVEN strip height whose f32
    temporaries fit `budget_bytes` (fori_loop keeps ONE strip's temps live —
    bigger strips mean bigger matmul M and far less per-strip launch
    latency; the first fixed-16 version ran 4x more, tiny [112,128] matmuls
    and measured latency-bound)."""
    if wg is None:
        wg = 32  # conservative default
    per_row = row_factor * (wg + 2) * 128 * 4  # live f32 row-planes per strip
    rows_max = max(budget_bytes // per_row, 2)
    best = None
    for s in range(1, h + 1):
        if h % s == 0 and (h // s) % 2 == 0:
            if h // s <= rows_max:
                return s
            best = s
    return best or 1


def _row_mask(r0, rows, h, wg, dtype):
    """[rows, wg+2, 1] 0/1 mask zeroing the padded border of PADDED-plane
    rows [r0, r0+rows) (r0 may be traced)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, wg + 2, 1), 0) + r0
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, wg + 2, 1), 1)
    inside = (ri >= 1) & (ri <= h) & (ci >= 1) & (ci <= wg)
    return inside.astype(dtype)


def _zero_borders(ref, h, wg):
    ref[0, 0:1, :, :] = jnp.zeros((1, wg + 2, 128), ref.dtype)
    ref[0, h + 1:h + 2, :, :] = jnp.zeros((1, wg + 2, 128), ref.dtype)
    ref[0, :, 0:1, :] = jnp.zeros((h + 2, 1, 128), ref.dtype)
    ref[0, :, wg + 1:wg + 2, :] = jnp.zeros((h + 2, 1, 128), ref.dtype)



def _flat(v):
    """[R, W, 128] -> [W + R*W + W, 128] (non-lane merge, layout-trivial)
    with one zero pad ROW on each end so corner taps (offset -1 / +1 beyond
    the plane) stay in bounds; window offsets must add `W`."""
    r, w, _ = v.shape
    return jnp.pad(v.reshape(r * w, 128), ((w, w), (0, 0)))


def _conv_flat(plane, bands, rp0, rows, h, wg, dtype):
    """Same-G conv over PADDED rows [rp0, rp0+rows) computed on the FULL
    padded width: each tap is a CONTIGUOUS flat window (offset
    (u-1)*(wg+2) + (s-1)) — no pad-dropping reshape, so no per-tap VREG
    compaction. Pad columns compute garbage and must be masked by the
    caller. plane: [h+2, wg+2, 128] VALUE; returns [rows, wg+2, 128] f32."""
    width = wg + 2
    flat = _flat(plane)
    P = rows * width
    acc = jnp.zeros((P, 128), jnp.float32)
    for u in range(3):
        for s in range(3):
            off = (rp0 + u - 1) * width + width + (s - 1)
            tile = jax.lax.slice(flat, (off, 0), (off + P, 128))
            acc = acc + _dot(tile.astype(dtype), bands[0, u, s])
    return acc.reshape(rows, width, 128)


def _convT_flat(plane, bands_t, rp0, rows, h, wg, dtype):
    """Transpose form of _conv_flat (reverse offsets)."""
    width = wg + 2
    flat = _flat(plane)
    P = rows * width
    acc = jnp.zeros((P, 128), jnp.float32)
    for u in range(3):
        for s in range(3):
            off = (rp0 + 1 - u) * width + width + (1 - s)
            tile = jax.lax.slice(flat, (off, 0), (off + P, 128))
            acc = acc + _dot(tile.astype(dtype), bands_t[0, u, s])
    return acc.reshape(rows, width, 128)


def _conv_rows(src_ref, bands, r0, rows, wg, ratio, dtype, from_ref=True,
               src_val=None):
    """conv rows [r0, r0+rows) (unpadded coords) from a padded source:
    9 banded matmuls; returns [rows, ratio*wg, 128] f32."""
    accs = [jnp.zeros((rows * wg, 128), jnp.float32) for _ in range(ratio)]
    for u in range(3):
        for s in range(3):
            if from_ref:
                tile = src_ref[0, pl.ds(r0 + u, rows), s:s + wg, :]
            else:
                tile = jax.lax.slice(src_val, (u, s, 0),
                                     (u + rows, s + wg, 128))
            t2 = tile.reshape(rows * wg, 128).astype(dtype)
            for r in range(ratio):
                accs[r] = accs[r] + _dot(t2, bands[r, u, s])
    if ratio == 1:
        return accs[0].reshape(rows, wg, 128)
    stacked = jnp.stack([a.reshape(rows, wg, 128) for a in accs], axis=2)
    return stacked.reshape(rows, wg * ratio, 128)


def _k_conv(xpad_ref, bands_ref, zpad_ref, sums_ref, acc, *, h, wg, ratio,
            dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    wgo = wg * ratio
    _zero_borders(zpad_ref, h, wgo)
    ns = _strips(h, wg)
    rs = h // ns
    bands = bands_ref[...]

    def body(i, carry):
        s0, s1 = carry
        r0 = i * rs
        z = _conv_rows(xpad_ref, bands, r0, rs, wg, ratio, dtype)
        zpad_ref[0, pl.ds(1 + r0, rs), 1:1 + wgo, :] = z.astype(zpad_ref.dtype)
        return (s0 + jnp.sum(z, axis=(0, 1)), s1 + jnp.sum(z * z, axis=(0, 1)))

    z128 = jnp.zeros((128,), jnp.float32)
    s0, s1 = jax.lax.fori_loop(0, ns, body, (z128, z128))
    acc[0, :] += s0
    acc[1, :] += s1

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        sums_ref[...] = acc[...]


def _a_rows(zpad_ref, coef_ref, r0, rows, h, wg, dtype):
    """relu(bn(z)) for PADDED rows [r0, r0+rows), borders re-zeroed."""
    zs = zpad_ref[0, pl.ds(r0, rows), :, :]
    a = jnp.maximum(_bn(zs, coef_ref[0], coef_ref[1]), 0.0)
    return (a * _row_mask(r0, rows, h, wg, jnp.float32)).astype(dtype)


def _k_bnconv(zpad_ref, coef_ref, bands_ref, z1pad_ref, sums_ref, acc,
              *, h, wg, ratio, dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    assert ratio == 1  # conv1 is always same-G; expand convs use _k_conv
    # whole-plane relu(bn(z)) once, borders re-zeroed (bn shifts the pad)
    a_plane = _a_rows(zpad_ref, coef_ref, 0, h + 2, h, wg, dtype)
    ns = _strips(h, wg)
    rs = h // ns
    bands = bands_ref[...]
    s0 = jnp.zeros((128,), jnp.float32)
    s1 = jnp.zeros((128,), jnp.float32)
    for i in range(ns):  # python strips: _conv_flat offsets are static
        z1w = _conv_flat(a_plane, bands, 1 + i * rs, rs, h, wg, dtype)
        z1w = z1w * _row_mask(1 + i * rs, rs, h, wg, jnp.float32)
        z1pad_ref[0, 1 + i * rs:1 + (i + 1) * rs, :, :] = \
            z1w.astype(z1pad_ref.dtype)
        s0 = s0 + jnp.sum(z1w, axis=(0, 1))
        s1 = s1 + jnp.sum(z1w * z1w, axis=(0, 1))
    _zero_borders(z1pad_ref, h, wg)
    acc[0, :] += s0
    acc[1, :] += s1

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        sums_ref[...] = acc[...]


def _k_bnpool(z1pad_ref, coef_ref, perms_ref, e_ref, p_ref, *, h, wg, c,
              dtype):
    ns = _strips(h, wg)
    rs = h // ns
    perms = perms_ref[...]

    def body(i, _):
        r0 = i * rs
        z1 = z1pad_ref[0, pl.ds(1 + r0, rs), 1:1 + wg, :]
        e = jnp.maximum(_bn(z1, coef_ref[0], coef_ref[1]), 0.0).astype(dtype)
        e_ref[0, pl.ds(r0, rs)] = e.astype(e_ref.dtype)
        p_ref[0, pl.ds(r0 // 2, rs // 2)] = \
            _pool(e, perms, rs, wg, c).astype(p_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ns, body, 0)


def _dy_rows(z1pad_ref, coef_ref, perms_ref, dp_ref, de_ref, r0, rs, wg, c,
             dtype):
    """dy1 for interior rows [r0, r0+rs): pool-bwd + skip cotangent, masked
    by relu'. Returns (dy [f32], z1)."""
    z1 = z1pad_ref[0, pl.ds(1 + r0, rs), 1:1 + wg, :]
    y = _bn(z1, coef_ref[0], coef_ref[1])
    e = jnp.maximum(y, 0.0).astype(dtype)
    dp = dp_ref[0, pl.ds(r0 // 2, rs // 2)]
    da = _pool_bwd(e, dp, perms_ref[...], rs, wg, c).astype(jnp.float32)
    da = da + de_ref[0, pl.ds(r0, rs)].astype(jnp.float32)
    return jnp.where(y >= 0.0, da, 0.0), z1


def _k_poolsums(z1pad_ref, coef_ref, perms_ref, dp_ref, de_ref, sums_ref, acc,
                *, h, wg, c, dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    ns = _strips(h, wg)
    rs = h // ns

    def body(i, carry):
        s0, s1 = carry
        dy, z1 = _dy_rows(z1pad_ref, coef_ref, perms_ref, dp_ref, de_ref,
                          i * rs, rs, wg, c, dtype)
        return (s0 + jnp.sum(dy, axis=(0, 1)),
                s1 + jnp.sum(dy * z1.astype(jnp.float32), axis=(0, 1)))

    z128 = jnp.zeros((128,), jnp.float32)
    s0, s1 = jax.lax.fori_loop(0, ns, body, (z128, z128))
    acc[0, :] += s0
    acc[1, :] += s1

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        sums_ref[...] = acc[...]


def _k_dz1(z1pad_ref, coef1_ref, dcoef1_ref, perms_ref, dp_ref, de_ref,
           dz1pad_ref, *, h, wg, c, dtype):
    """dz1 = bn-backward(dy1) via the global coefficients; written as a
    PADDED plane for the following transpose-conv kernel."""
    _zero_borders(dz1pad_ref, h, wg)
    ns = _strips(h, wg)
    rs = h // ns

    def body(i, _):
        r0 = i * rs
        dy, z1 = _dy_rows(z1pad_ref, coef1_ref, perms_ref, dp_ref, de_ref,
                          r0, rs, wg, c, dtype)
        dz = (dcoef1_ref[0] * dy + dcoef1_ref[1]
              + dcoef1_ref[2] * z1.astype(jnp.float32))
        dz1pad_ref[0, pl.ds(1 + r0, rs), 1:1 + wg, :] = \
            dz.astype(dz1pad_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ns, body, 0)


def _convT_rows(dz_ref, bands_t, r0, rows, wg_out, ratio, dtype):
    """Transpose-conv rows [r0, r0+rows) from a padded dz ref (padded 1 row /
    `ratio` groups): reverse shifts, [rows, Wg_in, 128] f32."""
    wg_in = wg_out // ratio
    acc = jnp.zeros((rows * wg_in, 128), jnp.float32)
    for u in range(3):
        for s in range(3):
            tile = dz_ref[0, pl.ds(r0 + 2 - u, rows),
                          (2 - s) * ratio:(2 - s) * ratio + wg_out, :]
            tile = tile.reshape(rows, wg_in, ratio, 128)
            for r in range(ratio):
                acc = acc + _dot(
                    tile[:, :, r, :].reshape(rows * wg_in, 128).astype(dtype),
                    bands_t[r, u, s])
    return acc.reshape(rows, wg_in, 128)


def _k_dwprev(dz1pad_ref, zprevpad_ref, coef0_ref, bands_t_ref,
              dy0pad_ref, dband_ref, sums0_ref, dwacc, acc,
              *, h, wg, dtype):
    """Banded dW1 accumulation against a0 = relu(bn0(z0)); dy0 =
    (conv1^T dz1) * relu'0 written as a PADDED plane; bn0 lane sums.
    conv1 is same-G (ratio 1)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dwacc[...] = jnp.zeros_like(dwacc)
        acc[...] = jnp.zeros_like(acc)

    _zero_borders(dy0pad_ref, h, wg)
    ns = _strips(h, wg, row_factor=20)
    rs = h // ns
    bands_t = bands_t_ref[...]
    a_plane = _a_rows(zprevpad_ref, coef0_ref, 0, h + 2, h, wg, dtype)
    a_flat = _flat(a_plane)
    dz_flat = _flat(dz1pad_ref[0])  # pad rows/cols are ZERO by construction
    width = wg + 2
    s0 = jnp.zeros((128,), jnp.float32)
    s1 = jnp.zeros((128,), jnp.float32)
    for i in range(ns):  # python strips: flat offsets are static
        rp0 = 1 + i * rs
        P = rs * width
        dzw = jax.lax.slice(dz_flat, (width + rp0 * width, 0),
                            (width + rp0 * width + P, 128)).astype(dtype)
        parts = []
        for u in range(3):
            for s in range(3):
                off = width + (rp0 + u - 1) * width + (s - 1)
                tile = jax.lax.slice(a_flat, (off, 0), (off + P, 128))
                # dz pad entries are zero, so full-width windows accumulate
                # EXACTLY the interior dW
                parts.append(jax.lax.dot_general(
                    tile, dzw, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        dwacc[...] += jnp.stack(parts)
        da0w = _convT_flat(dz1pad_ref[0], bands_t, rp0, rs, h, wg, dtype)
        z0w = zprevpad_ref[0, pl.ds(rp0, rs), :, :]
        y0 = _bn(z0w, coef0_ref[0], coef0_ref[1])
        dy0 = jnp.where(y0 >= 0.0, da0w, 0.0)
        dy0 = dy0 * _row_mask(rp0, rs, h, wg, jnp.float32)
        dy0pad_ref[0, rp0:rp0 + rs, :, :] = dy0.astype(dy0pad_ref.dtype)
        s0 = s0 + jnp.sum(dy0, axis=(0, 1))
        s1 = s1 + jnp.sum(dy0 * z0w.astype(jnp.float32)
                          * _row_mask(rp0, rs, h, wg, jnp.float32),
                          axis=(0, 1))
    _zero_borders(dy0pad_ref, h, wg)
    acc[0, :] += s0
    acc[1, :] += s1

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dband_ref[...] = dwacc[...]
        sums0_ref[...] = acc[...]


def _k_dwdx(zpad_ref, dcoef_ref, dy0pad_ref, xpad_ref, bands_t_ref,
            dx_ref, dband_ref, dwacc, *, h, wg, ratio, dtype):
    """First-packed-conv backward (stage-2): dz0 from coef; banded dW0
    accumulation against the stage input; dx = conv0^T(dz0). Each strip
    recomputes dz for rows [r0, r0+rs+2) (elementwise) into a local padded
    buffer to give the transpose conv its row halo."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dwacc[...] = jnp.zeros_like(dwacc)

    wg_in = wg // ratio
    ns = _strips(h, wg, row_factor=40)
    rs = h // ns
    bands_t = bands_t_ref[...]

    def dz_rows(r0, rows):
        z = zpad_ref[0, pl.ds(r0, rows), :, :]
        dyp = dy0pad_ref[0, pl.ds(r0, rows), :, :]
        dz = (dcoef_ref[0] * dyp.astype(jnp.float32) + dcoef_ref[1]
              + dcoef_ref[2] * z.astype(jnp.float32))
        dz = dz * _row_mask(r0, rows, h, wg, jnp.float32)
        if ratio > 1:
            dz = jnp.pad(dz[:, 1:1 + wg, :], ((0, 0), (ratio, ratio), (0, 0)))
        return dz.astype(dtype)

    def body(i, _):
        r0 = i * rs
        dzpad = dz_rows(r0, rs + 2)
        if ratio > 1:
            dzi = jax.lax.slice(dzpad, (1, ratio, 0),
                                (1 + rs, ratio + wg, 128))
        else:
            dzi = jax.lax.slice(dzpad, (1, 1, 0), (1 + rs, 1 + wg, 128))
        dzr = dzi.reshape(rs, wg_in, ratio, 128)
        parts = []
        for u in range(3):
            for s in range(3):
                tile = xpad_ref[0, pl.ds(r0 + u, rs), s:s + wg_in, :]
                t2d = tile.reshape(rs * wg_in, 128).astype(dtype)
                for r in range(ratio):
                    parts.append(jax.lax.dot_general(
                        t2d, dzr[:, :, r, :].reshape(rs * wg_in, 128),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
        dwacc[...] += jnp.stack(parts)
        wg_out2 = wg  # conv0 output groups
        dx = jnp.zeros((rs * wg_in, 128), jnp.float32)
        for u in range(3):
            for s in range(3):
                tile = jax.lax.slice(
                    dzpad, (2 - u, (2 - s) * ratio, 0),
                    (2 - u + rs, (2 - s) * ratio + wg_out2, 128))
                tile = tile.reshape(rs, wg_in, ratio, 128)
                for r in range(ratio):
                    dx = dx + _dot(
                        tile[:, :, r, :].reshape(rs * wg_in, 128),
                        bands_t[r, u, s])
        dx_ref[0, pl.ds(r0, rs)] = dx.reshape(rs, wg_in, 128).astype(
            dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ns, body, 0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dband_ref[...] = dwacc[...]


# ------------------------------------------------------------------ glue (XLA)
def _bn_fwd_coef(sums, n, gamma, beta):
    """(mean, var, inv, shift) from lane sums folded per channel."""
    c = gamma.shape[0]
    g = 128 // c
    mean = sums[0].reshape(g, c).sum(0) / n
    var = jnp.maximum(sums[1].reshape(g, c).sum(0) / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5) * gamma
    shift = beta - mean * inv
    return mean, var, inv, shift


def _lane(v, c):
    return jnp.tile(v, 128 // c)


def _bn_bwd_coef(sums_dy, n, mean, var, gamma):
    """dz = c0*dy + c1 + c2*z coefficients + (dgamma, dbeta) from lane sums
    (S_dy, S_dy*z)."""
    c = gamma.shape[0]
    g = 128 // c
    s1 = sums_dy[0].reshape(g, c).sum(0)
    s2 = sums_dy[1].reshape(g, c).sum(0)
    sigma2 = var + 1e-5
    sigma = jnp.sqrt(sigma2)
    inv = gamma / sigma
    dxhat_sum = (s2 - mean * s1) / sigma          # sum(dy * xhat)
    c2 = -inv * (s2 - mean * s1) / (n * sigma2)
    c1 = -inv * s1 / n - mean * c2
    c0 = inv
    dgamma = dxhat_sum
    dbeta = s1
    return c0, c1, c2, dgamma, dbeta


def _vecs(*rows):
    return jnp.stack([r.astype(jnp.float32) for r in rows])


def _bands_fwd(w, ratio):
    """[ratio, 3, 3, 128, 128] band matrices (ratio=1 gets a leading 1)."""
    b = _band_matrices(w)  # [u,s,128,128] or [r,u,s,128,128]
    if b.ndim == 4:
        b = b[None]
    assert b.shape[0] == ratio, (b.shape, ratio)
    return b


def _bands_t(w, ratio):
    """Transposed band matrices for conv^T: [ratio, 3, 3, 128, 128]."""
    return jnp.swapaxes(_bands_fwd(w, ratio), -1, -2)


def _pc(kernel, grid, in_specs, out_shapes, out_specs, scratch):
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, scratch_shapes=scratch, interpret=_interpret())


def _plane_in(h, wg):
    return pl.BlockSpec((1, h, wg, 128), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _full_in(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM)


# ------------------------------------------------------------ the fused block
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_packed_block(x, w0, g0, b0, w1, g1, b1, c_in, c_out, dtype_name,
                       external_first):
    """One ConvBlock+pool stage on packed activations.

    x: external_first=True -> the PADDED packed output of an XLA first conv
    ([B, H+2, Wg+2, 128], C=c_out); else the padded packed stage input
    ([B, H+2, Wg_in+2, 128], C=c_in) and w0 is applied in-kernel.
    Returns (p, e, mean0, var0, mean1, var1): pooled output [B,H/2,Wg/2,128],
    pre-pool activation e [B,H,Wg,128], and the two BN batch stats [C].

    VJP CONTRACT: the custom backward propagates cotangents ONLY through the
    (p, e) outputs; cotangents on the four batch-stat outputs are silently
    DROPPED (they are running-average buffers, stop_gradient'ed by
    PallasConvStage — torch BN semantics). Do not differentiate through the
    returned mean/var: the gradient would be silently zero, not an error.
    """
    out, _ = _fwd(x, w0, g0, b0, w1, g1, b1, c_in, c_out, dtype_name,
                  external_first)
    return out


def _fwd(x, w0, g0, b0, w1, g1, b1, c_in, c_out, dtype_name, external_first):
    dtype = jnp.dtype(dtype_name)
    bsz = x.shape[0]
    c = c_out
    if external_first:
        zpad = x.astype(dtype)
        h, wg = zpad.shape[1] - 2, zpad.shape[2] - 2
        sums0 = _sum_plane(zpad, h, wg)
    else:
        assert c_out % c_in == 0, (c_in, c_out)
        h, wg_in = x.shape[1] - 2, x.shape[2] - 2
        ratio0 = c_out // c_in
        wg = wg_in * ratio0
        bands0 = _bands_fwd(w0, ratio0)
        zpad, sums0 = _pc(
            functools.partial(_k_conv, h=h, wg=wg_in, ratio=ratio0, dtype=dtype),
            bsz,
            [_plane_in(h + 2, wg_in + 2), _full_in(bands0.shape)],
            (jax.ShapeDtypeStruct((bsz, h + 2, wg + 2, 128), dtype),
             jax.ShapeDtypeStruct((2, 128), jnp.float32)),
            (_plane_in(h + 2, wg + 2), _vec_out()),
            [pltpu.VMEM((2, 128), jnp.float32)],
        )(x.astype(dtype), bands0.astype(dtype))
    n = bsz * h * wg * (128 // c)
    mean0, var0, inv0, shift0 = _bn_fwd_coef(sums0, n, g0, b0)
    coef0 = _vecs(_lane(inv0, c), _lane(shift0, c))

    bands1 = _bands_fwd(w1, 1)
    z1pad, sums1 = _pc(
        functools.partial(_k_bnconv, h=h, wg=wg, ratio=1, dtype=dtype),
        bsz,
        [_plane_in(h + 2, wg + 2), _full_in((2, 128)), _full_in(bands1.shape)],
        (jax.ShapeDtypeStruct((bsz, h + 2, wg + 2, 128), dtype),
         jax.ShapeDtypeStruct((2, 128), jnp.float32)),
        (_plane_in(h + 2, wg + 2), _vec_out()),
        [pltpu.VMEM((2, 128), jnp.float32)],
    )(zpad, coef0, bands1.astype(dtype))
    mean1, var1, inv1, shift1 = _bn_fwd_coef(sums1, n, g1, b1)
    coef1 = _vecs(_lane(inv1, c), _lane(shift1, c))

    perms = jnp.asarray(np.stack(_pool_perms(c)))
    e, p = _pc(
        functools.partial(_k_bnpool, h=h, wg=wg, c=c, dtype=dtype),
        bsz,
        [_plane_in(h + 2, wg + 2), _full_in((2, 128)),
         _full_in((4, 128, 128))],
        (jax.ShapeDtypeStruct((bsz, h, wg, 128), dtype),
         jax.ShapeDtypeStruct((bsz, h // 2, wg // 2, 128), dtype)),
        (_plane_in(h, wg), _plane_in(h // 2, wg // 2)),
        [],
    )(z1pad, coef1, perms)

    out = (p, e, mean0, var0, mean1, var1)
    res = (x, zpad, z1pad, w0, w1, g0, b0, g1, b1,
           mean0, var0, inv0, shift0, mean1, var1, inv1, shift1)
    return out, res


def _vec_out():
    return pl.BlockSpec((2, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)


def _sum_plane(zpad, h, wg):
    z = zpad[:, 1:h + 1, 1:wg + 1, :].astype(jnp.float32)
    return jnp.stack([jnp.sum(z, axis=(0, 1, 2)),
                      jnp.sum(z * z, axis=(0, 1, 2))])


def _bwd(c_in, c_out, dtype_name, external_first, res, cts):
    dtype = jnp.dtype(dtype_name)
    (x, zpad, z1pad, w0, w1, g0, b0, g1, b1,
     mean0, var0, inv0, shift0, mean1, var1, inv1, shift1) = res
    dp, de = cts[0], cts[1]  # stats cotangents ignored (buffers)
    bsz = zpad.shape[0]
    c = c_out
    h, wg = zpad.shape[1] - 2, z1pad.shape[2] - 2
    wg0_in = x.shape[2] - 2
    ratio0 = 1 if external_first else c_out // c_in
    n = bsz * h * wg * (128 // c)
    coef0 = _vecs(_lane(inv0, c), _lane(shift0, c))
    coef1 = _vecs(_lane(inv1, c), _lane(shift1, c))

    # ---- bn1 global sums
    perms = jnp.asarray(np.stack(_pool_perms(c)))
    sums_dy1 = _pc(
        functools.partial(_k_poolsums, h=h, wg=wg, c=c, dtype=dtype),
        bsz,
        [_plane_in(h + 2, wg + 2), _full_in((2, 128)),
         _full_in((4, 128, 128)),
         _plane_in(h // 2, wg // 2), _plane_in(h, wg)],
        jax.ShapeDtypeStruct((2, 128), jnp.float32),
        _vec_out(),
        [pltpu.VMEM((2, 128), jnp.float32)],
    )(z1pad, coef1, perms, dp.astype(dtype), de.astype(dtype))
    c0_1, c1_1, c2_1, dg1, db1_ = _bn_bwd_coef(sums_dy1, n, mean1, var1, g1)
    dcoef1 = _vecs(_lane(c0_1, c), _lane(c1_1, c), _lane(c2_1, c))

    # ---- dz1 (padded plane), then banded dW1 + dy0 + bn0 sums
    bands1_t = _bands_t(w1, 1)
    dz1pad = _pc(
        functools.partial(_k_dz1, h=h, wg=wg, c=c, dtype=dtype),
        bsz,
        [_plane_in(h + 2, wg + 2), _full_in((2, 128)), _full_in((3, 128)),
         _full_in((4, 128, 128)),
         _plane_in(h // 2, wg // 2), _plane_in(h, wg)],
        jax.ShapeDtypeStruct((bsz, h + 2, wg + 2, 128), dtype),
        _plane_in(h + 2, wg + 2),
        [],
    )(z1pad, coef1, dcoef1, perms, dp.astype(dtype), de.astype(dtype))
    dy0pad, dband1, sums_dy0 = _pc(
        functools.partial(_k_dwprev, h=h, wg=wg, dtype=dtype),
        bsz,
        [_plane_in(h + 2, wg + 2), _plane_in(h + 2, wg + 2),
         _full_in((2, 128)), _full_in(bands1_t.shape)],
        (jax.ShapeDtypeStruct((bsz, h + 2, wg + 2, 128), dtype),
         jax.ShapeDtypeStruct((9, 128, 128), jnp.float32),
         jax.ShapeDtypeStruct((2, 128), jnp.float32)),
        (_plane_in(h + 2, wg + 2),
         pl.BlockSpec((9, 128, 128), lambda b: (0, 0, 0),
                      memory_space=pltpu.VMEM),
         _vec_out()),
        [pltpu.VMEM((9, 128, 128), jnp.float32),
         pltpu.VMEM((2, 128), jnp.float32)],
    )(dz1pad, zpad, coef0, bands1_t.astype(dtype))
    c0_0, c1_0, c2_0, dg0, db0_ = _bn_bwd_coef(sums_dy0, n, mean0, var0, g0)
    dcoef0 = _vecs(_lane(c0_0, c), _lane(c1_0, c), _lane(c2_0, c))

    # dW1 from the banded cotangent via vjp of the band construction
    _, vjp1 = jax.vjp(lambda w: _bands_fwd(w, 1), w1)
    dw1 = vjp1(dband1.reshape(1, 3, 3, 128, 128))[0]

    # ---- first conv backward
    if external_first:
        # dz0 back to the XLA conv: elementwise bn-backward on the plane
        z0 = zpad[:, 1:h + 1, 1:wg + 1, :].astype(jnp.float32)
        dy0 = dy0pad[:, 1:h + 1, 1:wg + 1, :]
        dz0 = (_lane(c0_0, c) * dy0.astype(jnp.float32) + _lane(c1_0, c)
               + _lane(c2_0, c) * z0)
        dxx = jnp.pad(dz0, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dw0 = jnp.zeros_like(w0)
        return (dxx.astype(x.dtype), dw0, dg0, db0_, dw1, dg1, db1_)

    bands0_t = _bands_t(w0, ratio0)
    dx, dband0 = _pc(
        functools.partial(_k_dwdx, h=h, wg=wg, ratio=ratio0, dtype=dtype),
        bsz,
        [_plane_in(h + 2, wg + 2), _full_in((3, 128)),
         _plane_in(h + 2, wg + 2),
         _plane_in(h + 2, wg0_in + 2), _full_in(bands0_t.shape)],
        (jax.ShapeDtypeStruct((bsz, h, wg0_in, 128), dtype),
         jax.ShapeDtypeStruct((9 * ratio0, 128, 128), jnp.float32)),
        (_plane_in(h, wg0_in),
         pl.BlockSpec((9 * ratio0, 128, 128), lambda b: (0, 0, 0),
                      memory_space=pltpu.VMEM)),
        [pltpu.VMEM((9 * ratio0, 128, 128), jnp.float32)],
    )(zpad, dcoef0, dy0pad, x.astype(dtype), bands0_t.astype(dtype))
    dxx = jnp.pad(dx, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(x.dtype)
    _, vjp0 = jax.vjp(lambda w: _bands_fwd(w, ratio0), w0)
    # accumulator index order (u, s, r) -> band layout [r, u, s, 128, 128]
    dband0_r = jnp.moveaxis(dband0.reshape(3, 3, ratio0, 128, 128), 2, 0)
    dw0 = vjp0(dband0_r)[0]
    return (dxx, dw0, dg0, db0_, dw1, dg1, db1_)


fused_packed_block.defvjp(_fwd, _bwd)
