"""Torch-convention BatchNorm for the UNet.

flax's ``nn.BatchNorm`` updates the running variance with the *biased* batch
variance; torch's ``nn.BatchNorm2d`` (reference semi_seg/arch/unet.py:73-76)
uses the *unbiased* one (Bessel factor n/(n-1)) for the running update while
normalizing with the biased one. That n/(n-1) drift compounds over an epoch
and breaks eval-mode parity with reference checkpoints, so this module pins
the torch semantics exactly:

- normalize with biased batch variance (train) / running variance (eval);
- running update: ``running = (1-m)*running + m*stat`` with the UNBIASED
  variance (torch momentum convention; callers here pass flax-style
  ``momentum=1-m`` like ``nn.BatchNorm`` so the two modules are drop-in
  interchangeable);
- statistics reduced in float32 whatever the compute dtype (one-pass
  E[x^2]-mean^2, flax ``use_fast_variance`` equivalent — same math as torch,
  ~2x cheaper reductions);
- the affine apply folds to a per-channel ``x*w + b`` with w,b precomputed in
  f32 then cast to the compute dtype, so bf16 activations stay bf16 end to
  end (the round-4 measured win) without bf16 rsqrt noise.

Param/collection names match ``nn.BatchNorm`` ("scale"/"bias" params,
"mean"/"var" batch_stats) — checkpoints are interchangeable.

``axis_name`` gives cross-replica statistics under shard_map/pmap (under
GSPMD jit the f32 reductions are already global; pass None there).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class TorchBatchNorm(nn.Module):
    use_running_average: bool
    momentum: float = 0.9  # flax convention: running = m*running + (1-m)*batch
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    axis: int = -1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        feature_axis = self.axis % x.ndim
        reduce_axes = tuple(i for i in range(x.ndim) if i != feature_axis)
        feature_shape = (x.shape[feature_axis],)
        bshape = [1] * x.ndim
        bshape[feature_axis] = x.shape[feature_axis]

        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), feature_shape)
        scale = self.param("scale", nn.initializers.ones, feature_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, feature_shape, jnp.float32)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n = x.size // x.shape[feature_axis]
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)

        dt = self.dtype or x.dtype
        # subtract-first apply: (x - mean) * (scale * rsqrt(var+eps)) + bias.
        # scale folds into the f32 per-channel multiplier, but the bias does
        # NOT fold (x*w - mean*w cancels catastrophically when x ~ mean —
        # measured as gradcache-vs-direct grad drift past 1e-5).
        w = scale * jax.lax.rsqrt(var + self.epsilon)   # f32, per-channel
        return ((x.astype(dt) - mean.astype(dt).reshape(bshape))
                * w.astype(dt).reshape(bshape)
                + bias.astype(dt).reshape(bshape))
