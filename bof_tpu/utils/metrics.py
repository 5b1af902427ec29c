"""Lightweight counters/metrics stream.

The reference emits an ad-hoc metrics stream as cache log lines
(ALLOC/DEALLOC/COMMIT/EVICT/HIT/MISS with running sizes, cache.cpp:82-233).
Here it is a real counter registry that subsystems bump and benchmarks dump.
"""
from __future__ import annotations

import collections
import threading


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, float] = collections.defaultdict(float)

    def add(self, name: str, value: float = 1.0):
        with self._lock:
            self._counters[name] += value

    def set(self, name: str, value: float):
        with self._lock:
            self._counters[name] = value

    def get(self, name: str) -> float:
        with self._lock:
            return self._counters.get(name, 0.0)

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return dict(self._counters)

    def reset(self):
        with self._lock:
            self._counters.clear()


METRICS = Metrics()
