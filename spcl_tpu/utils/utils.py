"""Core host-side utilities.

Replaces the reference's `contrastyou/utils/utils.py` + the
`deepclustering2.utils` surface it imports (SURVEY.md §2.10): seeding,
scalar-or-list broadcasting (`ntuple`), logging setup, yaml io.

JAX note: device-side randomness is handled exclusively through explicit
PRNG keys (see spcl_tpu/utils/rng.py); `fix_all_seed` only pins *host*
randomness (python/numpy) used by samplers and data splits.
"""
from __future__ import annotations

import collections.abc
import logging
import random
import sys
from contextlib import contextmanager
from itertools import repeat
from pathlib import Path
from typing import Any, Dict, Mapping, Union

import numpy as np
import yaml

PathLike = Union[str, Path]


# ----------------------------------------------------------------------------- seeding
def fix_all_seed(seed: int) -> None:
    """Pin host RNGs (python + numpy). Device RNG is key-based and needs no pinning."""
    random.seed(seed)
    np.random.seed(seed)


@contextmanager
def fix_all_seed_within_context(seed: int):
    """Seed host RNGs inside the block, restoring prior state on exit.

    Mirrors reference contrastyou/utils/utils.py:135-173 (without
    torch/cuda state, which has no analog here).
    """
    py_state = random.getstate()
    np_state = np.random.get_state()
    fix_all_seed(seed)
    try:
        yield
    finally:
        random.setstate(py_state)
        np.random.set_state(np_state)


# ----------------------------------------------------------------------------- broadcast helpers
def ntuple(n: int):
    """Return a function broadcasting a scalar (or checking a length-n seq) to an n-tuple.

    Mirrors reference contrastyou/utils/utils.py:176-197, used by hook
    factories to broadcast per-feature hyperparameters.
    """

    def parse(x):
        if isinstance(x, str):
            return tuple(repeat(x, n))
        if isinstance(x, collections.abc.Iterable):
            x = tuple(x)
            if len(x) == 1:
                return tuple(repeat(x[0], n))
            if len(x) != n:
                raise ValueError(f"expected length {n}, got {len(x)}: {x}")
            return x
        return tuple(repeat(x, n))

    return parse


def nlist(n: int):
    f = ntuple(n)

    def parse(x):
        return list(f(x))

    return parse


# ----------------------------------------------------------------------------- misc
def path2Path(path: PathLike) -> Path:
    return path if isinstance(path, Path) else Path(path)


def yaml_load(path: PathLike) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def yaml_write(dictionary: Mapping, save_dir: PathLike, save_name: str) -> str:
    save_dir = path2Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / save_name
    with open(out, "w") as f:
        yaml.safe_dump(_to_plain(dictionary), f, sort_keys=False)
    return str(out)


def _to_plain(obj):
    if isinstance(obj, Mapping):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def class_name(obj) -> str:
    return obj.__class__.__name__


def gethash(repo_dir: PathLike = None) -> str:
    """Current git commit hash, or None outside a repo (reference
    contrastyou/__init__.py:10-17; dumped per run dir for reproducibility)."""
    import subprocess
    cwd = str(path2Path(repo_dir or Path(__file__).parents[2]))
    try:
        return subprocess.check_output(["git", "rev-parse", "HEAD"], cwd=cwd,
                                       stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return None


# deepclustering2 type-converter surface (SURVEY §2.10): trivial in JAX but
# kept so reference-side code ports 1:1.
def to_numpy(x) -> np.ndarray:
    import jax
    return np.asarray(jax.device_get(x))


def to_float(x) -> float:
    return float(np.asarray(x).reshape(-1)[0]) if np.ndim(x) else float(x)


def to_device(x, device=None):
    import jax
    return jax.device_put(x, device)


def item2str(item: Mapping) -> str:
    """dict -> 'k1:v1, k2:v2' (deepclustering2 tqdm formatting parity;
    meters/display.py::meter_display is the richer nested version)."""
    return ", ".join(f"{k}:{v}" for k, v in item.items())


def flatten_dict(d: Mapping, parent_key: str = "", sep: str = "/") -> Dict[str, Any]:
    """Flatten a nested dict into `{a/b/c: leaf}` (used for TB scalar trees).

    Mirrors reference contrastyou/writer.py:26-49 flattening semantics.
    """
    items = {}
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if isinstance(v, Mapping):
            items.update(flatten_dict(v, new_key, sep=sep))
        else:
            items[new_key] = v
    return items


class ExceptionIgnorer:
    """Context manager swallowing the given exception types (deepclustering2 parity)."""

    def __init__(self, *exceptions):
        self._exceptions = exceptions or (Exception,)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        return exc_type is not None and issubclass(exc_type, self._exceptions)


# ----------------------------------------------------------------------------- logging
_LOG_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s:%(lineno)d - %(message)s"


def config_logger(save_dir: PathLike = None, level: int = logging.INFO) -> logging.Logger:
    """Configure root logging: stderr + optional per-run file log.

    Mirrors reference contrastyou/utils/utils.py:200-203 (loguru file sink).
    """
    root = logging.getLogger("spcl_tpu")
    root.setLevel(logging.DEBUG)
    if not any(isinstance(h, logging.StreamHandler) and h.stream is sys.stderr for h in root.handlers):
        sh = logging.StreamHandler(sys.stderr)
        sh.setLevel(level)
        sh.setFormatter(logging.Formatter(_LOG_FORMAT))
        root.addHandler(sh)
    if save_dir is not None:
        save_dir = path2Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(save_dir / "run.log")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(_LOG_FORMAT))
        root.addHandler(fh)
    return root


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"spcl_tpu.{name}")
