"""Host batching + device prefetch.

Replaces torch DataLoader workers + `BackgroundGenerator`
(contrastyou/data/loader.py:5-67). Decoding already happened at pack time,
so "loading" is a numpy gather; `device_prefetch` overlaps the host gather
and H2D copy with device compute by keeping `depth` batches in flight
(double buffering, SURVEY.md §2.11 intra-host pipeline row).
"""
from __future__ import annotations

import threading
from queue import Queue
from typing import Iterator

import jax
from .dataset import SliceDataset


class HostLoader:
    """Iterate (batch_dict, filenames) over a dataset with an index sampler."""

    def __init__(self, dataset: SliceDataset, sampler, with_filenames: bool = False):
        self._dataset = dataset
        self._sampler = sampler
        self._with_filenames = with_filenames

    @property
    def dataset(self) -> SliceDataset:
        return self._dataset

    @property
    def sampler(self):
        return self._sampler

    def __len__(self):
        # infinite samplers have no len; mirror torch DataLoader's TypeError
        return len(self._sampler)  # type: ignore[arg-type]

    def __iter__(self):
        for idx in self._sampler:
            batch = self._dataset.batch(idx)
            if self._with_filenames:
                yield batch, self._dataset.batch_filenames(idx)
            else:
                yield batch


def device_prefetch(iterator: Iterator, depth: int = 2, device=None) -> Iterator:
    """Asynchronously device_put `depth` batches ahead of consumption.

    Multi-host: a NamedSharding `device` spanning non-addressable devices is
    ingested shard-wise via parallel/mesh.py::put_tree (every process draws
    the same global batch from its seed-deterministic loader)."""
    put = jax.device_put
    from jax.sharding import NamedSharding
    if (jax.process_count() > 1 and isinstance(device, NamedSharding)):
        from ..parallel.mesh import put_tree
        put = lambda tree, sh: put_tree(tree, sh.mesh, sh.spec)  # noqa: E731
    q: "Queue" = Queue(maxsize=depth)
    stop = object()

    def producer():
        try:
            for item in iterator:
                if isinstance(item, tuple):
                    batch, extra = item
                    q.put((put(batch, device), extra))
                else:
                    q.put(put(item, device))
        finally:
            q.put(stop)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
