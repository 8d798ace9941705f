"""Epoch-indexed metric history -> CSV.

Capability parity with reference contrastyou/meters/storage_interface.py:17-84:
a per-epoch dict of flattened metric scalars appended to a history table and
written to `storage.csv`; `state_dict` round-trips for resume.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import pandas as pd

from ..utils.utils import flatten_dict


class Storage:
    def __init__(self, save_dir: str = None, csv_name: str = "storage.csv"):
        self._save_dir = save_dir
        self._csv_name = csv_name
        self._history: Dict[int, Dict] = {}

    def put_epoch(self, epoch: int, statistics: Dict) -> None:
        self._history[int(epoch)] = flatten_dict(statistics)

    def add_from_meter_interface(self, epoch: int, **group_stats) -> None:
        self.put_epoch(epoch, group_stats)

    @property
    def history(self) -> Dict[int, Dict]:
        return dict(self._history)

    def to_dataframe(self) -> pd.DataFrame:
        df = pd.DataFrame.from_dict(self._history, orient="index").sort_index()
        df.index.name = "epoch"
        return df

    def flush(self) -> None:
        if self._save_dir is None or not self._history:
            return
        Path(self._save_dir).mkdir(parents=True, exist_ok=True)
        self.to_dataframe().to_csv(Path(self._save_dir) / self._csv_name)

    def state_dict(self) -> Dict:
        return {"history": self._history}

    def load_state_dict(self, state: Dict) -> None:
        self._history = {int(k): v for k, v in state["history"].items()}
