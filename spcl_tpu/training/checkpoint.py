"""Checkpoint save/load.

Parity with the reference policy (contrastyou/trainer/_io.py:15-134):
`best.ckpt` on val-score improvement + `last.ckpt` every epoch, a recursive
state_dict (here: the TrainState pytree + host metadata), atomic writes via
tempfile+rename (`safe_save`), and *model-only* warm starts
(`extract_model_state_dict` parity) — how pretrain hands weights to finetune.

Format: one file = msgpack(flax.serialization) of the device state pytree,
wrapped with pickled host metadata (epoch counters, best score, storage
history, hook scheduler states, config).
"""
from __future__ import annotations

import os
import pickle
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from flax import serialization

from ..utils.utils import get_logger

logger = get_logger("checkpoint")


def safe_save(payload: bytes, path: str) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, str(path))
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_checkpoint(path: str, state, host_meta: Optional[Dict[str, Any]] = None) -> None:
    state = jax.device_get(state)
    payload = pickle.dumps({
        "state_bytes": serialization.to_bytes(state),
        "host_meta": host_meta or {},
    })
    safe_save(payload, path)
    logger.debug("saved checkpoint to %s (%d bytes)", path, len(payload))


def load_checkpoint(path: str, state_template):
    """Restore (state, host_meta). `state_template` provides the pytree
    structure (an initialized TrainState of identical shape)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    state = serialization.from_bytes(state_template, blob["state_bytes"])
    return state, blob.get("host_meta", {})


def _merge_partial(template: Dict, saved: Dict) -> Dict:
    """Overlay saved leaves onto the template, keeping template entries with
    no counterpart (e.g. a decoder that an encoder-only pretrain never
    created — reference warm starts behave the same way: the finetune decoder
    starts from fresh init)."""
    out = {}
    for k, tv in template.items():
        if k in saved:
            if isinstance(tv, dict) and isinstance(saved[k], dict):
                out[k] = _merge_partial(tv, saved[k])
            else:
                out[k] = serialization.from_state_dict(tv, saved[k])
        else:
            out[k] = tv
    return out


def load_model_params(path: str, params_template):
    """Model-only warm start (reference utils.py:100-103 extract_model_state_dict):
    pull just params['model'] (+ batch_stats) out of a full checkpoint.
    Tolerates partial trees in either direction (encoder-only pretrain ->
    full-model finetune, and vice versa)."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    full = serialization.msgpack_restore(blob["state_bytes"])
    model_params = _merge_partial(
        serialization.to_state_dict(params_template["params"]), full["params"]["model"])
    model_params = serialization.from_state_dict(params_template["params"], model_params)
    batch_stats = _merge_partial(
        serialization.to_state_dict(params_template["batch_stats"]), full["batch_stats"])
    batch_stats = serialization.from_state_dict(params_template["batch_stats"], batch_stats)
    return model_params, batch_stats
