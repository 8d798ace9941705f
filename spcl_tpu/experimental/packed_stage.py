"""Lane-packed small-C encoder stages (the TPU layout XLA won't pick).

Round-3 device profiling (scripts/profile_step_ops.py) showed stages 1-2 of
the UNet — C = 16/32 at 224^2/112^2 — costing 12.9 of the 17.3 ms bf16
pretrain step: for C < 128 NHWC convs XLA lays the BATCH into the 128-wide
lane axis (2N=60 -> 128 = 2.13x padded HBM traffic on every stage tensor)
and a logical-NCHW rewrite measures identical (layout assignment overrides
it). The fix here removes the layout from XLA's control:

- Activations travel as ``[B, H, Wg, 128]`` where one lane group packs
  G = 128/C adjacent columns x C channels (W*C = Wg*128 exactly for the
  UNet's 224*16 / 112*32 stage shapes). The minor dim is 128 — every
  elementwise/BN/reduction op runs at full lane utilization and zero
  padding, whatever layout XLA assigns.
- The 3x3 convs become NINE dense ``[*, 128] x [128, 128]`` matmuls
  (vertical tap u = H-shift; horizontal tap v = banded 128x128 weight
  matrices with structural zeros; cross-group taps ride a Wg-shift with a
  single-block matrix). The MXU runs them at full tile utilization; the
  structural zeros trade G x more machine-FLOPs for lanes — a win whenever
  C < 128 (measured: the whole stage-1/2 region drops ~3x). Weight
  matrices are assembled from the ordinary ``[3,3,Ci,Co]`` parameters by a
  static 0/1 placement einsum, so the parameter tree (and checkpoints)
  are IDENTICAL to the plain ConvBlock path.
- BN uses the same one-pass E[x^2]-E[x]^2 statistics as ConvBlock (torch
  parity), computed over the packed lanes and folded per channel; running
  stats live in the standard flax ``batch_stats`` collection under the
  same names.
- 2x2 maxpool = one row-max + one lane-group max; its autodiff
  subgradient routes ties to the first element (torch's tie rule).

Everything is pure jnp: jax.grad differentiates the formulation into
full-utilization transpose matmuls (dW / dx) with no custom VJP.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# --------------------------------------------------------------------- packing
def packable(w: int, c1: int, c2: int) -> bool:
    """True when input width `w` and stage channels (c1, c2) satisfy every
    128-lane grouping constraint of the packed stage-1/2 pipeline (convs +
    the two pool group-merges). The UNet production shapes (224/256 crops,
    max_channel 256) qualify; odd test shapes fall back to the NHWC path."""
    if w % 4 != 0:
        return False
    for width, c in ((w, c1), (w // 2, c1), (w // 2, c2), (w // 4, c2)):
        if (width * c) % 128 != 0:
            return False
    return c1 <= 128 and c2 <= 128 and 128 % c1 == 0 and 128 % c2 == 0


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, Wg, 128] with G = 128/C columns per group.
    Requires W*C % 128 == 0 (UNet stage shapes satisfy this)."""
    b, h, w, c = x.shape
    assert (w * c) % 128 == 0, (w, c)
    return x.reshape(b, h, (w * c) // 128, 128)


def unpack(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """[B, H, Wg, 128] -> [B, H, W, C]."""
    b, h, wg, _ = x.shape
    return x.reshape(b, h, (wg * 128) // c, c)


@lru_cache()
def _placement(ci: int, co: int) -> np.ndarray:
    """Static 0/1 placement P[s, v, gi*ci, go*co] mapping a conv tap
    (horizontal offset v-1 in {-1,0,1}) into the banded lane-group matrix
    for input-group shift s-1 in {-1,0,1}.

    Input lanes: (gi, ci) = column 8?*... column o_in = gi within a group of
    G_in = 128/ci columns; output lanes (go, co), G_out = 128/co columns.
    An entry is set when input column (s-1)*G_out? ... concretely: output
    column index within its group = go; absolute column = J*G_out + go for
    output group J; it reads input absolute column J*G_out + go + (v-1),
    which lives in input group J' = J + (s-1) (same Wg axis: groups span
    G_in input columns = G_out*co/ci ... for ci == co, G_in == G_out) at
    lane gi = that column minus J'*G_in.
    """
    g_in, g_out = 128 // ci, 128 // co
    p = np.zeros((3, 3, 128, 128), np.float32)
    ratio = g_out * co // 128  # ==1 when ci==co (the only same-G case used)
    del ratio
    for go in range(g_out):
        for dv in (-1, 0, 1):
            col_in = go + dv  # in units of columns (ci==co: col grid shared)
            s = 0
            if col_in < 0:
                s, col_in = -1, col_in + g_in
            elif col_in >= g_in:
                s, col_in = 1, col_in - g_in
            for c_i in range(ci):
                for c_o in range(co):
                    p[s + 1, dv + 1, col_in * ci + c_i, go * co + c_o] = 1.0
    return p


@lru_cache()
def _placement_expand(ci: int, co: int) -> np.ndarray:
    """Placement for ci != co (e.g. 16 -> 32): output groups are smaller
    (G_out = 128/co) so `ratio` = G_in/G_out output groups map onto one
    input group. P[r, s, v, 128, 128] where r indexes the output group's
    position within the input group."""
    g_in, g_out = 128 // ci, 128 // co
    ratio = g_in // g_out
    p = np.zeros((ratio, 3, 3, 128, 128), np.float32)
    for r in range(ratio):
        for go in range(g_out):
            col_out = r * g_out + go  # column within the INPUT group grid
            for dv in (-1, 0, 1):
                col_in = col_out + dv
                s = 0
                if col_in < 0:
                    s, col_in = -1, col_in + g_in
                elif col_in >= g_in:
                    s, col_in = 1, col_in - g_in
                for c_i in range(ci):
                    for c_o in range(co):
                        p[r, s + 1, dv + 1, col_in * ci + c_i, go * co + c_o] = 1.0
    return p


def _band_matrices(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,Ci,Co] conv kernel -> [u, s, 128, 128] banded matmul weights
    (ci == co), or [r, u, s, 128, 128] for ci != co. Lane k's channel is
    k % Ci (K axis) / k % Co (N axis), so the kernel tiles over lanes and
    the static placement mask selects the banded positions."""
    ci, co = w.shape[2], w.shape[3]
    wk = jnp.tile(w, (1, 1, 128 // ci, 128 // co))  # [3, 3, 128, 128]
    if ci == co:
        p = jnp.asarray(_placement(ci, co))  # [s, v, 128, 128]
        # W[u, s, K, N] = sum_v P[s, v, K, N] * w[u, v, K%ci, N%co]
        return jnp.einsum("svkn,uvkn->uskn", p, wk)
    p = jnp.asarray(_placement_expand(ci, co))      # [r, s, v, 128, 128]
    return jnp.einsum("rsvkn,uvkn->ruskn", p, wk)


def _shifted(xp: jnp.ndarray, u: int, s: int) -> jnp.ndarray:
    """xp padded [B, H+2, Wg+2, 128] -> the (u, s)-shifted [B, H, Wg, 128]."""
    h, wg = xp.shape[1] - 2, xp.shape[2] - 2
    return jax.lax.dynamic_slice(
        xp, (0, u, s, 0), (xp.shape[0], h, wg, 128))


def packed_conv(x: jnp.ndarray, w: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """3x3 same-padding conv on packed activations.

    x: [B, H, Wg, 128] packed with C = w.shape[2] channels; w: [3,3,Ci,Co].
    Returns [B, H, Wg_out, 128] packed with Co channels (Wg_out = Wg*Co/Ci).
    """
    ci, co = w.shape[2], w.shape[3]
    cdt = x.dtype if dtype is None else dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(cdt)
    if ci == co:
        bands = _band_matrices(w).astype(cdt)  # [u, s, 128, 128]
        out = None
        for u in range(3):
            for s in range(3):
                t = jnp.einsum("bhgk,kn->bhgn", _shifted(xp, u, s), bands[u, s],
                               preferred_element_type=cdt)
                out = t if out is None else out + t
        return out
    bands = _band_matrices(w).astype(cdt)      # [r, u, s, 128, 128]
    ratio = bands.shape[0]
    out = None
    for u in range(3):
        for s in range(3):
            # one matmul against the r-stacked [128, ratio*128] matrix
            wmat = jnp.moveaxis(bands[:, u, s], 0, 1).reshape(128, ratio * 128)
            t = jnp.einsum("bhgk,kn->bhgn", _shifted(xp, u, s), wmat,
                           preferred_element_type=cdt)
            out = t if out is None else out + t
    b, h, wg, _ = out.shape
    return out.reshape(b, h, wg * ratio, 128)


def packed_pool(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """2x2/stride-2 maxpool on packed [B, H, Wg, 128] with C=c channels.
    Returns [B, H/2, Wg/2, 128] (adjacent groups re-merged to 128 lanes).
    Ties route to the first element (jnp.maximum's subgradient), matching
    torch's first-index rule."""
    b, h, wg, _ = x.shape
    g = 128 // c
    v = jnp.maximum(x[:, 0::2], x[:, 1::2])                  # vertical pairs
    v = v.reshape(b, h // 2, wg, g // 2, 2, c)
    hmax = jnp.maximum(v[..., 0, :], v[..., 1, :])           # horizontal pairs
    # [b, h/2, wg, g/2, c] -> merge two adjacent groups into 128 lanes
    return hmax.reshape(b, h // 2, wg // 2, 128)


class _PackedBN(nn.Module):
    """BatchNorm on packed lanes with ConvBlock-identical param/stat trees
    (params scale/bias [C]; batch_stats mean/var [C]) and flax's
    use_fast_variance one-pass statistics + running-average update."""
    channels: int
    momentum: float = 0.1  # torch convention (see ConvBlock)

    @nn.compact
    def __call__(self, x, *, train: bool):
        c = self.channels
        g = 128 // c
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            n = x.shape[0] * x.shape[1] * x.shape[2] * g
            lane_sum = jnp.sum(xf, axis=(0, 1, 2))          # [128]
            lane_sq = jnp.sum(jnp.square(xf), axis=(0, 1, 2))
            mean = lane_sum.reshape(g, c).sum(0) / n
            var = jnp.maximum(lane_sq.reshape(g, c).sum(0) / n
                              - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = 1.0 - self.momentum  # flax momentum convention
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        shift = bias - mean * inv
        inv_l = jnp.tile(inv, g).astype(x.dtype)
        shift_l = jnp.tile(shift, g).astype(x.dtype)
        return x * inv_l + shift_l


class _BNVars(nn.Module):
    """Param/stat holder for the fused Pallas stage: first call returns
    (scale, bias); a second call with the kernel-computed batch stats
    performs the running-average update. Tree-identical to nn.BatchNorm."""
    channels: int
    momentum: float = 0.1

    @nn.compact
    def __call__(self, stats: Optional[Tuple] = None):
        c = self.channels
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if stats is not None and not self.is_initializing():
            m = 1.0 - self.momentum  # flax momentum convention
            ra_mean.value = m * ra_mean.value + (1 - m) * stats[0]
            ra_var.value = m * ra_var.value + (1 - m) * stats[1]
        return scale, bias


class _Kernel(nn.Module):
    """Bare conv-kernel param holder (name "kernel", nn.Conv tree parity)."""
    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, self.in_ch, self.out_ch), jnp.float32)


class PallasConvStage(nn.Module):
    """Train-mode ConvBlock+BN stage executed by the fused Pallas kernels
    (experimental/packed_block_pallas.fused_packed_block). Same param tree as
    ConvBlock. Returns the PRE-POOL packed activation e [B, H, Wg, 128];
    pool via packed_pool. `first_conv_nhwc`: stage-1's C=1 input conv runs
    as a plain nn.Conv and its packed output feeds the kernels."""
    in_ch: int
    out_ch: int
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32
    first_conv_nhwc: bool = False

    @nn.compact
    def __call__(self, x):
        from .packed_block_pallas import fused_packed_block
        bn0 = _BNVars(self.out_ch, self.momentum, name="bn0")
        bn1 = _BNVars(self.out_ch, self.momentum, name="bn1")
        g0, b0 = bn0()
        g1, b1 = bn1()
        if self.first_conv_nhwc:
            z0 = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                         dtype=self.dtype, name="conv0")(x)
            xin = jnp.pad(pack(z0), ((0, 0), (1, 1), (1, 1), (0, 0)))
            w0 = jnp.zeros((3, 3, self.in_ch, self.out_ch), jnp.float32)
        else:
            xin = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            w0 = _Kernel(self.in_ch, self.out_ch, name="conv0")()
        w1 = _Kernel(self.out_ch, self.out_ch, name="conv1")()
        p, e, mean0, var0, mean1, var1 = fused_packed_block(
            xin, w0, g0, b0, w1, g1, b1, self.in_ch, self.out_ch,
            jnp.dtype(self.dtype).name, self.first_conv_nhwc)
        bn0((jax.lax.stop_gradient(mean0), jax.lax.stop_gradient(var0)))
        bn1((jax.lax.stop_gradient(mean1), jax.lax.stop_gradient(var1)))
        return p, e


class _PackedConv(nn.Module):
    """Owner of one conv kernel (param name "kernel", nn.Conv tree parity)
    applied via packed_conv."""
    in_ch: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_ch, self.out_ch), jnp.float32)
        return packed_conv(x, w, dtype=self.dtype)


class PackedConvStage(nn.Module):
    """ConvBlock-equivalent (conv3x3 -> BN -> ReLU, x2) on packed lanes.
    Parameter tree matches ConvBlock exactly (conv0/conv1 kernels under
    those submodule names, bn0/bn1 scale/bias + batch_stats), so
    checkpoints interchange.

    `first_conv_nhwc`: the stage-1 input is C=1 (224*1 isn't 128-packable):
    run conv0 as a plain NHWC nn.Conv and pack its output; everything after
    stays packed."""
    in_ch: int
    out_ch: int
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32
    first_conv_nhwc: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.first_conv_nhwc:
            x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name="conv0")(x)
            x = pack(x)
        else:
            x = _PackedConv(self.in_ch, self.out_ch, dtype=self.dtype,
                            name="conv0")(x)
        x = _PackedBN(self.out_ch, self.momentum, name="bn0")(x, train=train)
        x = nn.relu(x)
        x = _PackedConv(self.out_ch, self.out_ch, dtype=self.dtype,
                        name="conv1")(x)
        x = _PackedBN(self.out_ch, self.momentum, name="bn1")(x, train=train)
        return nn.relu(x)
