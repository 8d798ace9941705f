"""2x2/stride-2 max pool with an equality-mask backward (TPU fast path).

The reference UNet downsamples with torch ``nn.MaxPool2d(2)``
(contrastyou/arch/unet.py:110-141); its gradient routes each pooled dy to
one argmax element. XLA's autodiff of ``reduce_window``-max lowers the
backward to ``select-and-scatter``, which is a slow sequential window scan
on TPU: the round-3 per-op profile (benchmarks/step_ops_r3.json) attributes
9.9 ms/step (f32) / 4.5 ms/step (bf16) of the flagship pretrain step to
select-and-scatter alone — the single largest op category.

This op keeps the ``reduce_window`` FORWARD (XLA's pooled max is fine) and
replaces only the BACKWARD with

    dx = where(x == up2(y), up2(dy), 0)

— pure elementwise work over the input-resolution tensor (broadcast the
pooled max/dy back over each 2x2 window, compare, select). XLA fuses the
broadcast+compare+select with the adjacent BN/ReLU backward fusions, so the
net cost is roughly one extra read of x instead of a windowed scatter scan.

Tie semantics (the one deviation from torch/select-and-scatter): every
element tied for the window max receives the FULL dy, instead of one winner
taking it. In the conv->BN->ReLU->pool stacks this feeds (models/unet.py),
ties happen at ReLU-clamped zeros, where the downstream ReLU backward
multiplies by (pre > 0) = 0 — so the extra dy copies are annihilated and
the end-to-end parameter gradient is unchanged (pinned by
tests/test_maxpool.py::test_relu_pool_composition_matches_xla). Ties
between strictly positive activations are measure-zero for continuous
inputs.
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
