"""Prioritizer — rank ready tasks by bytes-to-prefetch.

Re-design of the reference's Prioritizer (reference: include/scheduler/
prioritizer.h:49-143): among ready tasks, prefer the one whose working set
needs the fewest bytes fetched given the current cache contents — it
becomes computable soonest and maximizes reuse of resident tiles.
`use_prio=False` degrades to FCFS exactly like the reference.
"""
from __future__ import annotations

import collections
from typing import Optional

from .cache import TileCache
from .task import Task, access_key


class Prioritizer:
    def __init__(self, cache: TileCache, use_prio: bool = True):
        self._cache = cache
        self._use_prio = use_prio
        self._deque: collections.deque[Task] = collections.deque()

    def __len__(self):
        return len(self._deque)

    def insert(self, task: Task):
        self._deque.append(task)

    def update(self):
        """Re-rank by bytes not yet resident (reference:
        prioritizer.h:116-139)."""
        if not self._use_prio or len(self._deque) <= 1:
            return
        all_keys = {}
        for t in self._deque:
            for store, off, si in t.read_list + t.write_list:
                all_keys[access_key(store, off, si)] = si.nbytes
        resident = self._cache.cached_keys(all_keys.keys())

        def mem_reqd(t: Task) -> int:
            need = 0
            seen = set()
            for store, off, si in t.read_list + t.write_list:
                k = access_key(store, off, si)
                if k in seen or k in resident:
                    continue
                seen.add(k)
                need += si.nbytes
            return need

        self._deque = collections.deque(
            sorted(self._deque, key=mem_reqd))

    def get_prio(self) -> Optional[Task]:
        return self._deque.popleft() if self._deque else None

    def return_prio(self, task: Task):
        self._deque.appendleft(task)
