"""Surface distance metrics: Hausdorff, 95%-Hausdorff, ASSD.

Capability parity with reference contrastyou/meters/surface_meter.py:21-149,
which delegates to medpy's `__surface_distances`. Re-implemented here on
scipy (euclidean distance transform of the complement + border extraction
via binary erosion) — identical math, no medpy dependency.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np
from scipy.ndimage import binary_erosion, distance_transform_edt, generate_binary_structure

from .metric import Metric


def _surface_distances(result: np.ndarray, reference: np.ndarray,
                       voxelspacing=None) -> np.ndarray:
    """Distances from each surface voxel of `result` to the surface of `reference`."""
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    if not result.any() or not reference.any():
        return np.asarray([np.nan])
    footprint = generate_binary_structure(result.ndim, connectivity=1)
    result_border = result ^ binary_erosion(result, structure=footprint, iterations=1)
    reference_border = reference ^ binary_erosion(reference, structure=footprint, iterations=1)
    dt = distance_transform_edt(~reference_border, sampling=voxelspacing)
    return dt[result_border]


def hausdorff_distance(result, reference, voxelspacing=None, percentile: float = 100.0) -> float:
    """percentile=100 -> HD (max over both directions). percentile<100 ->
    the reference's `mod_hausdorff_distance` convention: the MAX of the two
    per-direction percentiles (contrastyou/meters/surface_distance.py:17-25)
    — NOT medpy's hd95, which percentiles the concatenation."""
    d1 = _surface_distances(result, reference, voxelspacing)
    d2 = _surface_distances(reference, result, voxelspacing)
    if np.isnan(d1).any() or np.isnan(d2).any():
        return float("nan")
    if percentile >= 100.0:
        return float(max(d1.max(), d2.max()))
    return float(max(np.percentile(d1, percentile), np.percentile(d2, percentile)))


def average_surface_distance(result, reference, voxelspacing=None) -> float:
    """medpy `assd` semantics (the reference delegates to it,
    surface_distance.py:28-29): the mean of the two DIRECTIONAL means —
    not the mean of the concatenated distances."""
    d1 = _surface_distances(result, reference, voxelspacing)
    d2 = _surface_distances(reference, result, voxelspacing)
    if np.isnan(d1).any() or np.isnan(d2).any():
        return float("nan")
    return float((d1.mean() + d2.mean()) / 2.0)


class SurfaceMeter(Metric):
    """Per-scan surface metrics over selected classes.

    abbr: "HD" (Hausdorff), "HD95", "ASSD". Expensive -> threaded by default.
    """

    def __init__(self, C: int = 4, report_axises: Sequence[int] = (1,),
                 metername: str = "hausdorff", threaded: bool = True):
        assert metername in ("hausdorff", "hausdorff95", "average_surface"), metername
        self._C = C
        self._report_axis = list(report_axises)
        self._metername = metername
        super().__init__(threaded=threaded)
        self.reset()

    def reset(self):
        self._values: List[np.ndarray] = []

    def _compute(self, pred: np.ndarray, target: np.ndarray,
                 voxelspacing=None) -> np.ndarray:
        vals = []
        for c in self._report_axis:
            p, t = pred == c, target == c
            if self._metername == "hausdorff":
                vals.append(hausdorff_distance(p, t, voxelspacing))
            elif self._metername == "hausdorff95":
                vals.append(hausdorff_distance(p, t, voxelspacing, percentile=95.0))
            else:
                vals.append(average_surface_distance(p, t, voxelspacing))
        return np.asarray(vals, dtype=np.float64)

    def _add(self, pred_labels: np.ndarray, target_labels: np.ndarray,
             group_name: Union[str, None] = None, voxelspacing=None):
        """pred/target: [D, H, W] (a whole scan) or [H, W] int label maps.
        `voxelspacing` (reference surface_meter.py add(): per-dim mm) scales
        distances for anisotropic scans."""
        self._values.append(self._compute(np.asarray(pred_labels),
                                          np.asarray(target_labels),
                                          voxelspacing))

    def _summary(self) -> Dict[str, float]:
        if not self._values:
            return {f"{self._abbr}{c}": float("nan") for c in self._report_axis}
        arr = np.stack(self._values, axis=0)
        with np.errstate(invalid="ignore"):
            means = np.nanmean(arr, axis=0)
        out = {f"{self._abbr}{c}": float(m) for c, m in zip(self._report_axis, means)}
        out[f"{self._abbr}_mean"] = float(np.nanmean(means))
        return out

    @property
    def _abbr(self) -> str:
        return {"hausdorff": "HD", "hausdorff95": "HD95", "average_surface": "ASSD"}[self._metername]
