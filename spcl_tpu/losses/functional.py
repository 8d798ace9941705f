"""One-hot / simplex helpers (deepclustering2.utils parity, SURVEY.md §2.10)."""
from __future__ import annotations

import jax.numpy as jnp


def class2one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Integer label map [B, ...] -> one-hot [B, ..., C] (channel-last; the
    torch reference uses channel-second)."""
    return jnp.equal(labels[..., None], jnp.arange(num_classes)).astype(jnp.float32)


def simplex(probs: jnp.ndarray, axis: int = -1, atol: float = 1e-4) -> bool:
    """Host-side check that `probs` sums to one along `axis` (debug use only —
    not jit-traceable as a python bool)."""
    import numpy as np
    s = np.asarray(jnp.sum(probs, axis=axis))
    return bool(np.allclose(s, 1.0, atol=atol))


def one_hot_check(t: jnp.ndarray, axis: int = -1) -> bool:
    import numpy as np
    arr = np.asarray(t)
    return bool(np.all((arr == 0) | (arr == 1)) and np.allclose(arr.sum(axis=axis), 1.0))


def probs2one_hot(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    idx = jnp.argmax(probs, axis=axis)
    return class2one_hot(idx, probs.shape[axis])
