"""Prefetch pipeline helper over the tile cache.

Small utility shared by kernel planners: given an ordered list of accesses,
keeps `depth` of them pinned ahead in the tile cache so disk I/O overlaps
with device compute — the planner-side expression of the reference's
prefetch pipeline (the Prioritizer+backlog machinery services the pins).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from .cache import TileCache


class PrefetchSeq:
    """Sequential prefetcher: access i is pinned `depth` steps early;
    call get(i) in order, then done(i)."""

    def __init__(self, cache: TileCache,
                 accesses: Sequence[Tuple[object, int, object]],
                 depth: int = 4):
        self._cache = cache
        self._accesses = list(accesses)
        self._depth = max(1, depth)
        self._keys: dict[int, tuple] = {}
        self._next_pin = 0
        self._pump(0)

    def _pump(self, upto: int):
        while (self._next_pin < len(self._accesses)
               and self._next_pin <= upto + self._depth - 1):
            st, off, si = self._accesses[self._next_pin]
            self._keys[self._next_pin] = self._cache.pin_read(st, off, si)
            self._next_pin += 1

    def get(self, idx: int) -> np.ndarray:
        self._pump(idx)
        key = self._keys[idx]
        self._cache.wait_ready(key)
        return self._cache.buf(key)

    def done(self, idx: int):
        key = self._keys.pop(idx, None)
        if key is not None:
            self._cache.unpin(key)

    def close(self):
        for key in self._keys.values():
            self._cache.unpin(key)
        self._keys.clear()
