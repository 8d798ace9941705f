"""PICA partition-uncertainty losses.

Math parity with reference contrastyou/losses/pica_loss.py:9-84: cosine
similarity between the class-assignment *columns* of the two views plus a
negative-entropy regularizer on the class marginal.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.heads import l2_normalize


def pui_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, lamb: float = 2.0) -> jnp.ndarray:
    """[B,K] simplex inputs. Column-wise cosine agreement + marginal entropy."""
    k = x_out.shape[1]
    c1 = l2_normalize(x_out.T, axis=1)      # [K, B] rows are class columns
    c2 = l2_normalize(x_tf_out.T, axis=1)
    agreement = jnp.sum(c1 * c2, axis=1)    # diag of c1 @ c2^T
    loss_ce = -jnp.mean(jnp.log(agreement + 1e-10))
    marginal = jnp.mean(x_out, axis=0)
    marginal = marginal / jnp.sum(marginal)
    loss_ne = jnp.sum(marginal * jnp.log(marginal + 1e-10)) + jnp.log(jnp.asarray(float(k)))
    return loss_ce + lamb * loss_ne


def pui_seg_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, lamb: float = 2.0) -> jnp.ndarray:
    """Dense variant: flatten spatial dims then apply pui_loss ([B,H,W,K] NHWC)."""
    k = x_out.shape[-1]
    return pui_loss(x_out.reshape(-1, k), x_tf_out.reshape(-1, k), lamb)
