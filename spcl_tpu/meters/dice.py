"""Per-scan (3D) Dice meter.

Capability parity with reference contrastyou/meters/general_dice_meter.py:19-171
(`UniversalDice`): per-slice per-class intersection/union accumulated and
grouped by scan name; per-scan Dice = (2*sum(I)+1e-6)/(sum(U)+1e-6); report
`DSC{i}` per reported class plus `DSC_mean`.

TPU split of responsibilities: the per-slice intersection/union *sums* are
computed on device inside the jitted eval step (`dice_stats_from_labels` —
one fused one-hot + reduction, no host round trip per pixel); the meter only
aggregates small [B, C] arrays by group on the host.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Union

import jax.numpy as jnp
import numpy as np

from .metric import Metric


def dice_stats_from_labels(pred_labels: jnp.ndarray, target_labels: jnp.ndarray,
                           num_classes: int, valid: jnp.ndarray = None,
                           pixel_mask: jnp.ndarray = None):
    """Device-side: [B, H, W] int labels -> ([B, C] intersection, [B, C] union).

    `valid` ([B] 1/0) zeroes padded slices so padded eval batches are exact.
    `pixel_mask` ([B, H, W] 1/0) restricts stats to in-frame pixels: the
    shortest-side val-resize path pads non-square frames into a static canvas
    where pred == lab == 0, which would inflate CLASS-0 inter/union (classes
    >= 1 are unaffected); masking makes every class's stats frame-exact.
    """
    classes = jnp.arange(num_classes)
    p = jnp.equal(pred_labels[..., None], classes).astype(jnp.float32)
    t = jnp.equal(target_labels[..., None], classes).astype(jnp.float32)
    if pixel_mask is not None:
        p = p * pixel_mask[..., None]
        t = t * pixel_mask[..., None]
    inter = jnp.sum(p * t, axis=(1, 2))
    union = jnp.sum(p + t, axis=(1, 2))
    if valid is not None:
        inter = inter * valid[:, None]
        union = union * valid[:, None]
    return inter, union


class UniversalDice(Metric):
    def __init__(self, C: int = 4, report_axises: Sequence[int] = None):
        super().__init__(threaded=False)
        if report_axises is not None:
            assert max(report_axises) <= C, (C, report_axises)
        self._C = C
        self._report_axis = list(report_axises) if report_axises is not None else list(range(C))
        self.reset()

    def reset(self):
        self._inter: List[np.ndarray] = []
        self._union: List[np.ndarray] = []
        self._group_names: List[str] = []
        self._n = 0

    def _add(self, inter: np.ndarray, union: np.ndarray,
             group_name: Union[str, Sequence[str], None] = None):
        """inter/union: [B, C] numpy arrays from `dice_stats_from_labels`."""
        inter = np.asarray(inter)
        union = np.asarray(union)
        b = inter.shape[0]
        if group_name is None:
            names = [f"{self._n}_{i:03d}" for i in range(b)]  # per-slice dice
        elif isinstance(group_name, str):
            names = [group_name] * b  # whole batch is one scan -> 3D dice
        else:
            names = list(group_name)
            assert len(names) == b, (len(names), b)
        self._inter.append(inter)
        self._union.append(union)
        self._group_names.extend(names)
        self._n += 1

    def add_labels(self, pred_labels, target_labels, group_name=None, valid=None):
        """Convenience: accept label maps directly (host or device arrays)."""
        inter, union = dice_stats_from_labels(
            jnp.asarray(pred_labels), jnp.asarray(target_labels), self._C,
            None if valid is None else jnp.asarray(valid))
        if valid is not None and group_name is not None and not isinstance(group_name, str):
            keep = np.asarray(valid).astype(bool)
            inter, union = np.asarray(inter)[keep], np.asarray(union)[keep]
            group_name = [g for g, k in zip(group_name, keep) if k]
        self._add(np.asarray(inter), np.asarray(union), group_name)

    @property
    def group_names(self) -> List[str]:
        return sorted(set(self._group_names))

    def per_group_dice(self) -> Dict[str, np.ndarray]:
        if self._n == 0:
            return {}
        inter = np.concatenate(self._inter, axis=0)
        union = np.concatenate(self._union, axis=0)
        names = np.asarray(self._group_names)
        out = {}
        for g in self.group_names:
            idx = names == g
            out[g] = (2 * inter[idx].sum(0) + 1e-6) / (union[idx].sum(0) + 1e-6)
        return out

    def value(self):
        if self._n == 0:
            return np.full(self._C, np.nan), np.full(self._C, np.nan)
        per_group = np.stack(list(self.per_group_dice().values()), axis=0)
        return per_group.mean(0), per_group.std(0)

    def _summary(self) -> Dict[str, float]:
        means, _ = self.value()
        report = {f"DSC{i}": float(means[i]) for i in self._report_axis}
        report["DSC_mean"] = float(np.mean(list(report.values())))
        return report
