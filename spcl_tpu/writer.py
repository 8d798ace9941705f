"""TensorBoard writer (reference contrastyou/writer.py:20-72 parity).

Flattens nested metric trees to scalar tags, skipping NaNs; degrades to a
no-op when tensorboard is unavailable. Figure dumps of similarity /
self-paced matrices (reference hooks/infonce.py:185-193) are supported via
add_image on raw arrays (no matplotlib dependency on the hot path).
"""
from __future__ import annotations

import math
from typing import Dict

import numpy as np

from .utils.utils import flatten_dict, get_logger

logger = get_logger("writer")


class SummaryWriter:
    def __init__(self, log_dir: str):
        self._log_dir = log_dir
        try:
            from torch.utils.tensorboard import SummaryWriter as _TBWriter
            self._tb = _TBWriter(log_dir=log_dir)
        except Exception as e:  # tensorboard not installed -> no-op
            logger.debug("tensorboard unavailable (%s); writer is a no-op", e)
            self._tb = None

    def add_scalars_from_meter_interface(self, epoch: int, **group_stats: Dict) -> None:
        if self._tb is None:
            return
        flat = flatten_dict(group_stats)
        for tag, value in flat.items():
            try:
                v = float(value)
            except (TypeError, ValueError):
                continue
            if math.isnan(v):
                continue
            self._tb.add_scalar(tag, v, global_step=epoch)

    def add_matrix_image(self, tag: str, matrix: np.ndarray, epoch: int) -> None:
        """Dump a [N, N] matrix (sim/mask/self-paced weights) as a grayscale image."""
        if self._tb is None:
            return
        m = np.asarray(matrix, dtype=np.float32)
        lo, hi = np.nanmin(m), np.nanmax(m)
        img = (m - lo) / (hi - lo + 1e-12)
        self._tb.add_image(tag, img[None, :, :], global_step=epoch)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class NullWriter(SummaryWriter):
    """Writer for non-master processes (multi-host): same interface, no IO."""

    def __init__(self):  # noqa: D401 — deliberately no log_dir
        self._log_dir = None
        self._tb = None
