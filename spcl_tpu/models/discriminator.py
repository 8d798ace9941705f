"""DCGAN-style discriminator for the adversarial semi-supervised baseline.

Capability parity with reference semi_seg/arch/discr.py:14-40: a conv stack
striding the prediction map down to a single real/fake logit.
NHWC; LeakyReLU(0.2) as in DCGAN.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class Discriminator(nn.Module):
    base_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C] softmax prediction map -> [B] real/fake logit."""
        c = self.base_channels
        x = x.astype(self.dtype)
        for i, ch in enumerate((c, c * 2, c * 4, c * 8)):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding=1, name=f"conv{i}")(x)
            if i > 0:
                x = nn.GroupNorm(num_groups=min(32, ch), name=f"gn{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = jnp.mean(x, axis=(1, 2))  # global pool tolerates any input size
        x = nn.Dense(1, name="fc")(x.astype(jnp.float32))
        return x[:, 0]
