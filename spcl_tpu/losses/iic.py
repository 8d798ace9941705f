"""IIC mutual-information losses (discrete-MI baseline).

Math parity with reference contrastyou/losses/iic_loss.py:
- `iid_loss`              <-> IIDLoss (:17-51) + compute_joint (:131-151)
- `iid_segmentation_loss` <-> IIDSegmentationLoss (:54-100): dense joint via
  a displacement-padded correlation of the two probability maps.

TPU notes: the dense joint is one conv-shaped contraction
(lax.conv_general_dilated with the second prob map as the kernel) — a pure
MXU op; everything stays f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_joint(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, symmetric: bool = True) -> jnp.ndarray:
    """[B,K] x [B,K] simplex inputs -> [K,K] joint distribution."""
    p = jnp.einsum("bi,bj->ij", x_out, x_tf_out, preferred_element_type=jnp.float32)
    if symmetric:
        p = (p + p.T) / 2.0
    return p / jnp.sum(p)


def iid_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, lamb: float = 1.0):
    """Negative mutual information of the paired cluster assignments.

    Returns (loss, loss_no_lamb) matching the reference's first two outputs.
    """
    k = x_out.shape[1]
    p_i_j = compute_joint(x_out, x_tf_out)
    p_i = jnp.broadcast_to(jnp.sum(p_i_j, axis=1, keepdims=True), (k, k))
    p_j = jnp.broadcast_to(jnp.sum(p_i_j, axis=0, keepdims=True), (k, k))
    logs = jnp.log(p_i_j + 1e-10)
    log_i = jnp.log(p_i + 1e-10)
    log_j = jnp.log(p_j + 1e-10)
    loss = -jnp.sum(p_i_j * (logs - lamb * log_j - lamb * log_i))
    loss_no_lamb = -jnp.sum(p_i_j * (logs - log_j - log_i))
    return loss, loss_no_lamb


def iid_segmentation_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray,
                          padding: int = 7, lamb: float = 1.0,
                          mask: jnp.ndarray = None) -> jnp.ndarray:
    """Dense IIC over prob maps [B,H,W,K] (NHWC).

    The displacement-joint p(k1,k2 | dy,dx) is the correlation of the two
    maps over a (2*padding+1)^2 window, normalized per displacement.
    """
    b, h, w, k = x_out.shape
    if mask is not None:
        x_out = x_out * mask
        x_tf_out = x_tf_out * mask
    t = 2 * padding + 1
    # conv with x_tf as kernel: lhs [1, K, B*?]. Reference does
    # F.conv2d(x_out^T(k,b,h,w), weight=x_tf^T(k,b,h,w), padding) -> [k,k,T,T].
    lhs = jnp.transpose(x_out, (3, 0, 1, 2)).reshape(k, b, h, w)  # K,B,H,W
    rhs = jnp.transpose(x_tf_out, (3, 0, 1, 2)).reshape(k, b, h, w)
    # dimension_numbers: lhs NCHW with N=k1, C=b; kernel OIHW with O=k2, I=b
    p = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)  # [k1, k2, T, T]
    p = p - jax.lax.stop_gradient(jnp.min(p)) + 1e-16
    p = jnp.transpose(p, (2, 3, 0, 1))  # T,T,k,k
    p = p / jnp.sum(p, axis=(2, 3), keepdims=True)
    p = (p + jnp.transpose(p, (0, 1, 3, 2))) / 2.0
    p_i = jnp.sum(p, axis=2, keepdims=True)
    p_j = jnp.sum(p, axis=3, keepdims=True)
    loss = -(p * (jnp.log(p + 1e-16) - lamb * jnp.log(p_i + 1e-16)
                  - lamb * jnp.log(p_j + 1e-16))).sum() / (t * t)
    return loss


def _patch_slices(size: int, patch: int, step: int):
    starts = list(range(0, max(size - patch, 0), step)) or [0]
    last = max(size - patch, 0)
    if starts[-1] != last:
        starts.append(last)
    return starts


def iid_segmentation_small_patch_loss(x_out: jnp.ndarray, x_tf_out: jnp.ndarray,
                                      padding: int = 7, patch_size: int = 32,
                                      lamb: float = 1.0,
                                      mask: jnp.ndarray = None) -> jnp.ndarray:
    """Patchified dense IIC (reference IIDSegmentationSmallPathLoss,
    iic_loss.py:103-128 + patch_generator :154-162): average the dense loss
    over half-overlapping patches. Patch offsets are static, so the loop
    unrolls at trace time."""
    step = patch_size // 2
    _, h, w, _ = x_out.shape
    losses = []
    for hs in _patch_slices(h, patch_size, step):
        for ws in _patch_slices(w, patch_size, step):
            sl = (slice(None), slice(hs, hs + patch_size), slice(ws, ws + patch_size))
            m = None if mask is None else mask[sl]
            losses.append(iid_segmentation_loss(x_out[sl], x_tf_out[sl],
                                                padding=padding, lamb=lamb, mask=m))
    return jnp.mean(jnp.stack(losses))
