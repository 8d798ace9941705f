"""Projection and cluster heads.

Capability parity with reference contrastyou/projectors/heads.py:78-169 and
projectors/nn.py:8-63, NHWC + MXU-friendly:

- `ProjectionHead`: adaptive pool -> flatten -> MLP/linear -> L2-normalize
  (encoder features, pooled to 1x1).
- `DenseProjectionHead`: 1x1-conv MLP -> adaptive pool to a small grid
  (decoder features, e.g. 10x10) -> channelwise L2-normalize.
- `ClusterHead` / `DenseClusterHead`: N independent subheads with
  temperature softmax (for IIC / discrete-MI).

Adaptive pooling matches torch's `AdaptiveAvgPool2d` bin boundaries
(floor(i*H/s) .. ceil((i+1)*H/s)) exactly, expressed as two small dense
matmuls so it rides the MXU instead of scatter/gather.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@lru_cache(maxsize=64)
def _adaptive_pool_matrix(in_size: int, out_size: int, mode: str = "avg") -> np.ndarray:
    """(out_size, in_size) row-stochastic averaging matrix with torch bin edges."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        mat[i, start:end] = 1.0 / (end - start)
    return mat


def adaptive_avg_pool(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pooling via two dense contractions."""
    _, h, w, _ = x.shape
    oh, ow = output_size
    if (h, w) == (oh, ow):
        return x
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    ah = jnp.asarray(_adaptive_pool_matrix(h, oh))
    aw = jnp.asarray(_adaptive_pool_matrix(w, ow))
    x = jnp.einsum("oh,bhwc->bowc", ah, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("pw,bowc->bopc", aw, x, preferred_element_type=jnp.float32)
    return x


def adaptive_max_pool(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    _, h, w, _ = x.shape
    oh, ow = output_size
    if oh == 1 and ow == 1:
        return jnp.max(x, axis=(1, 2), keepdims=True)
    # torch-style bins; static python loop (small, fixed out sizes)
    rows = []
    for i in range(oh):
        hs, he = int(np.floor(i * h / oh)), int(np.ceil((i + 1) * h / oh))
        cols = []
        for j in range(ow):
            ws, we = int(np.floor(j * w / ow)), int(np.ceil((j + 1) * w / ow))
            cols.append(jnp.max(x[:, hs:he, ws:we, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


class ProjectionHead(nn.Module):
    """Pooled contrastive projector for encoder features (heads.py:78-92)."""
    output_dim: int = 256
    hidden_dim: int = 256
    head_type: str = "mlp"  # "mlp" | "linear"
    normalize: bool = True
    pool_name: str = "adaptive_avg"  # "adaptive_avg" | "adaptive_max"
    spatial_size: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        assert self.pool_name in ("adaptive_avg", "adaptive_max"), self.pool_name
        pool = adaptive_avg_pool if self.pool_name == "adaptive_avg" else adaptive_max_pool
        x = pool(features.astype(jnp.float32), self.spatial_size)
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        if self.head_type == "mlp":
            x = nn.Dense(self.hidden_dim, name="fc0")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = nn.Dense(self.output_dim, name="fc1")(x)
        else:
            x = nn.Dense(self.output_dim, name="fc0")(x)
        x = x.astype(jnp.float32)
        return l2_normalize(x, axis=-1) if self.normalize else x


class DenseProjectionHead(nn.Module):
    """Dense (per-location) contrastive projector for decoder features
    (heads.py:96-120): 1x1-conv MLP, then pool to `spatial_size`, then
    channelwise normalize."""
    output_dim: int = 256
    hidden_dim: int = 128
    head_type: str = "mlp"
    normalize: bool = True
    pool_name: str = "adaptive_avg"
    spatial_size: Tuple[int, int] = (10, 10)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = features.astype(self.dtype)
        if self.head_type == "mlp":
            x = nn.Conv(self.hidden_dim, (1, 1), name="conv0")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = nn.Conv(self.output_dim, (1, 1), name="conv1")(x)
        else:
            x = nn.Conv(self.output_dim, (1, 1), name="conv0")(x)
        pool = adaptive_avg_pool if self.pool_name == "adaptive_avg" else adaptive_max_pool
        x = pool(x.astype(jnp.float32), self.spatial_size)
        return l2_normalize(x, axis=-1) if self.normalize else x


class ClusterHead(nn.Module):
    """N-subhead pooled cluster head with temperature softmax (heads.py:124-144)."""
    num_clusters: int = 5
    num_subheads: int = 10
    head_type: str = "linear"
    temperature: float = 1.0
    normalize: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        """Returns stacked subhead probabilities [S, B, K]."""
        x = jnp.mean(features.astype(jnp.float32), axis=(1, 2))  # global avg pool
        outs = []
        for s in range(self.num_subheads):
            h = x.astype(self.dtype)
            if self.head_type == "linear":
                h = nn.Dense(self.num_clusters, name=f"sub{s}_fc0")(h)
            else:
                h = nn.Dense(128, name=f"sub{s}_fc0")(h)
                h = nn.leaky_relu(h, negative_slope=0.01)
                h = nn.Dense(self.num_clusters, name=f"sub{s}_fc1")(h)
            h = h.astype(jnp.float32)
            if self.normalize:
                h = l2_normalize(h, axis=-1)
            outs.append(nn.softmax(h / self.temperature, axis=-1))
        return jnp.stack(outs, axis=0)


class DenseClusterHead(nn.Module):
    """N-subhead dense cluster head (heads.py:148-169): 1x1 convs -> per-pixel
    temperature softmax. Returns [S, B, H, W, K]."""
    num_clusters: int = 10
    hidden_dim: int = 64
    num_subheads: int = 10
    head_type: str = "linear"
    temperature: float = 1.0
    normalize: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for s in range(self.num_subheads):
            h = features.astype(self.dtype)
            if self.head_type == "linear":
                h = nn.Conv(self.num_clusters, (1, 1), name=f"sub{s}_conv0")(h)
            else:
                h = nn.Conv(self.hidden_dim, (1, 1), name=f"sub{s}_conv0")(h)
                h = nn.leaky_relu(h, negative_slope=0.01)
                h = nn.Conv(self.num_clusters, (1, 1), name=f"sub{s}_conv1")(h)
            h = h.astype(jnp.float32)
            if self.normalize:
                h = l2_normalize(h, axis=-1)
            outs.append(nn.softmax(h / self.temperature, axis=-1))
        return jnp.stack(outs, axis=0)
