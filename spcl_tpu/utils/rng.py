"""Explicit PRNG-key discipline.

The reference's correctness hinges on *seed reuse*: the same random flip
is applied to the second view of the inputs and later re-applied to
features/logits (reference semi_seg/epochers/new_epocher.py:158-170,
semi_seg/hooks/infonce.py:177-179, via `FixRandomSeed`). In JAX that
global-seed idiom becomes explicit key-threading: the step context
carries one key per purpose, and re-using a key replays the transform.

`KeyChain` is a host-side convenience that deterministically derives a
stream of keys from a base seed — one `.next()` per training step —
so epochs are reproducible and resumable (the chain position is part of
the checkpointed state).
"""
from __future__ import annotations

import jax
import numpy as np


def key_from_seed(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


class KeyChain:
    """Deterministic, checkpointable stream of PRNG keys.

    Keys are derived as fold_in(base, counter) so restoring `counter`
    resumes the exact stream. Keys are computed on the HOST (CPU backend)
    and returned as numpy — a per-step device dispatch for a 2-word key
    costs a full round trip through the device tunnel.
    """

    def __init__(self, seed: int, counter: int = 0):
        self._seed = int(seed)
        # local_devices: jax.devices("cpu")[0] is process 0's device on a
        # multi-host cluster — non-addressable from any other process
        self._cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(self._cpu):
            self._base = jax.random.PRNGKey(self._seed)
        self._counter = int(counter)

    def _fold(self, counter: int) -> np.ndarray:
        with jax.default_device(self._cpu):
            key = jax.random.fold_in(self._base, np.uint32(counter % (2 ** 31)))
        return np.asarray(key)

    def next(self) -> np.ndarray:
        key = self._fold(self._counter)
        self._counter += 1
        return key

    def peek(self) -> np.ndarray:
        return self._fold(self._counter)

    @property
    def counter(self) -> int:
        return self._counter

    def state_dict(self) -> dict:
        return {"seed": self._seed, "counter": self._counter}

    def load_state_dict(self, state: dict) -> None:
        self._seed = int(state["seed"])
        self._base = jax.random.PRNGKey(self._seed)
        self._counter = int(state["counter"])
