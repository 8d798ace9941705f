"""MEASURED-NEGATIVE: alternative 2x2 maxpool backwards vs select-and-scatter.

XLA autodiffs the ``reduce_window``-max forward into ``select-and-scatter``,
which profiles as the largest single op category of the flagship pretrain
step (5.6 ms bf16 / 12.3 ms f32 attributed, round-4 per-op trace). Round 4
built and measured two replacements on the v5e device plane, back-to-back
against the committed program (scripts/profile_step_ops.py, 2N=60):

    form                                     bf16       f32
    nn.max_pool (select-and-scatter bwd)     17.28      23.67   <- winner
    equality-mask custom VJP (this file)     18.27      24.31
      (jnp.repeat upsample variant)          20.48      26.51
    pairwise strided-quadrant max, XLA AD    28.10      35.96

Despite eliminating select-and-scatter entirely, the equality-mask backward
(``dx = where(x == y, dy, 0)`` in the bitcast window-split 5-D view) came
out ~1 ms SLOWER end to end: the compare forces XLA to restructure the
surrounding BN/ReLU backward fusions (total 'fusion' time grew by more than
select-and-scatter cost), i.e. select-and-scatter's attributed time was
already largely overlapped/fused. The pairwise-max form was 1.6x worse —
its four strided quadrant slices and interior-padded scatter transposes
each materialize. Conclusion: keep XLA's native maxpool autodiff
(models/unet.py); a profitable replacement must avoid breaking the
BN-backward fusion boundary, which no elementwise re-derivation of the
argmax can do from outside the fusion.

Re-tested after the round-4 bf16-BatchNorm change (where select-and-scatter
attributes 6.7 of 13.45 ms): equality-mask 13.465 vs native 13.448 at 2N=60
and 14.93 vs 15.03 at 2N=128 — a wash; the attributed select-and-scatter
time overlaps with other work, so there is no real win to harvest here.

Correctness of both variants is pinned by tests/test_experimental_maxpool.py
(forward/backward equivalence with XLA's form; documented tie semantics —
ties sit at ReLU-clamped zeros, so end-to-end gradients match bit-for-bit).

Reference workload: torch ``nn.MaxPool2d(2)`` in contrastyou/arch/unet.py.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["max_pool_2x2"]


def _window(data_format: str):
    if data_format == "NHWC":
        return (1, 2, 2, 1)
    assert data_format == "NCHW", data_format
    return (1, 1, 2, 2)


def _spatial_axes(data_format: str):
    return (1, 2) if data_format == "NHWC" else (2, 3)


def _win_split(v, data_format: str):
    """Bitcast-reshape [.., H, W, ..] -> [.., H/2, 2, W/2, 2, ..]: rows/cols
    split into (pooled index, within-window offset). Pure row-major dim
    split, so XLA lowers it as a bitcast — no copy."""
    ah, aw = _spatial_axes(data_format)
    s = v.shape
    ns = s[:ah] + (s[ah] // 2, 2) + s[ah + 1:aw] + (s[aw] // 2, 2) + s[aw + 1:]
    return v.reshape(ns)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2(x, data_format: str = "NHWC"):
    """Max pool with 2x2 window, stride 2, VALID padding (odd trailing
    rows/cols dropped, matching torch's floor-mode MaxPool2d)."""
    w = _window(data_format)
    return lax.reduce_window(x, -jnp.inf, lax.max, w, w, "VALID")


def _fwd(x, data_format):
    w = _window(data_format)
    y = lax.reduce_window(x, -jnp.inf, lax.max, w, w, "VALID")
    return y, (x, y)


def _bwd(data_format, res, dy):
    x, y = res
    ah, aw = _spatial_axes(data_format)
    # Odd trailing row/col (dropped by VALID) gets zero gradient: trim x to
    # the pooled extent before comparing, then pad the result back.
    he, we = y.shape[ah] * 2, y.shape[aw] * 2
    trim = [slice(None)] * x.ndim
    trim[ah], trim[aw] = slice(0, he), slice(0, we)
    xt = x[tuple(trim)]
    # Compare in the window-split 5/6-D view: xt bitcast-reshapes, y/dy get
    # size-1 window axes and broadcast INSIDE the elementwise op (fused as
    # producers) — nothing upsampled ever materializes. (A jnp.repeat-based
    # upsample was measured to materialize ~4.8 ms/step of broadcast_in_dim
    # on the flagship step — tmp/step_ops round-4 profile.)
    exp = [slice(None)] * x.ndim
    exp.insert(ah + 1, None)
    exp.insert(aw + 2, None)
    y5, dy5 = y[tuple(exp)], dy[tuple(exp)]
    dx = jnp.where(_win_split(xt, data_format) == y5, dy5,
                   jnp.zeros((), dy.dtype)).reshape(xt.shape)
    if xt.shape != x.shape:
        pad = [(0, 0)] * x.ndim
        pad[ah] = (0, x.shape[ah] - he)
        pad[aw] = (0, x.shape[aw] - we)
        dx = jnp.pad(dx, pad)
    return (dx.astype(x.dtype),)


max_pool_2x2.defvjp(_fwd, _bwd)


def max_pool_2x2_pairwise(x, data_format: str = "NHWC"):
    """Pairwise-max formulation: four strided quadrant slices combined with
    jnp.maximum, differentiated by XLA's native AD (select chains forward,
    interior-padded scatters backward). H/W are major dims in the TPU
    layouts this model produces, so the strided slices don't break tiling.
    Tie semantics: jnp.maximum splits dy 50/50 at exact ties (again
    annihilated by the downstream ReLU backward). Measurement candidate vs
    the reduce_window/select-and-scatter form and the equality-mask VJP."""
    ah, aw = _spatial_axes(data_format)
    he = (x.shape[ah] // 2) * 2
    we = (x.shape[aw] // 2) * 2

    def quad(i, j):
        idx = [slice(None)] * x.ndim
        idx[ah] = slice(i, he, 2)
        idx[aw] = slice(j, we, 2)
        return x[tuple(idx)]

    return jnp.maximum(jnp.maximum(quad(0, 0), quad(0, 1)),
                       jnp.maximum(quad(1, 0), quad(1, 1)))
