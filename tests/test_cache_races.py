"""Regression tests for cache accounting races (evict-then-repin backlog
duplication, aborted-stream stale tickets, allocate rollback) — each
reproduces a bug the review pass found, using a store whose read tickets
complete only when the test says so."""
import numpy as np
import pytest

from bof_tpu.core.cache import TileCache
from bof_tpu.io.store import BaseStore, Ticket
from bof_tpu.io.stride import StrideInfo


class SlowStore(BaseStore):
    """Reads stay in flight until the test completes them; writes finish
    instantly.  Tracks how many reads were issued."""

    def __init__(self, nbytes=1 << 20):
        self._data = np.zeros(nbytes, np.uint8)
        self.pending: list = []  # (ticket, offset, sinfo, out)
        self.reads = 0

    def size(self):
        return self._data.nbytes

    def read(self, offset, sinfo, out):
        t = Ticket(out)
        self.reads += 1
        self.pending.append((t, offset, sinfo, out))
        return t

    def write(self, offset, sinfo, src):
        return Ticket.completed()

    def complete_one(self, idx=0):
        t, off, sinfo, out = self.pending.pop(idx)
        out[:sinfo.nbytes] = 7  # recognizable fill
        t._complete()

    def flush(self):
        pass

    def close(self):
        pass


SI = StrideInfo.contiguous(4096)


def test_backlog_duplicate_key_serviced_once():
    """Evict-then-repin queues the same key twice in the backlog; it must
    be serviced exactly once (no double real_size, no orphaned first
    ticket, no buffer replacement)."""
    st = SlowStore()
    cache = TileCache(max_size=1 << 20)
    k = cache.pin_read(st, 0, SI)
    # NOT serviced yet; drop to zero-ref, then evict (as budget pressure
    # from another allocation would) — k stays queued in the backlog
    cache.unpin(k)
    with cache._lock:
        cache._evict_locked(k)
    assert cache.active_count == 0
    # re-pin k: its key is now in the backlog TWICE
    k = cache.pin_read(st, 0, SI)
    cache.service_backlog()
    assert st.reads == 1  # serviced exactly once
    assert cache.real_size == 4096  # counted once
    st.complete_one()
    cache.service_backlog()
    assert cache.ready(k)
    assert cache.buf(k)[0] == 7
    cache.unpin(k)


def test_aborted_stream_orphans_inflight_read():
    """Dropping a pinned entry (single_use_discard) while its read is in
    flight must orphan the ticket: a re-pin of the same key gets a FRESH
    entry that only completes when ITS OWN read finishes."""
    st = SlowStore()
    cache = TileCache(max_size=1 << 20, single_use_discard=True)
    k = cache.pin_read(st, 0, SI)
    cache.service_backlog()  # read T1 now in flight
    assert st.reads == 1
    cache.unpin(k)  # aborted stream: entry dropped, T1 orphaned
    k = cache.pin_read(st, 0, SI)  # fresh entry, queued for its own read
    st.complete_one(0)  # T1 (the STALE ticket) completes
    cache.service_backlog()  # reaps T1 as an orphan; issues read T2
    assert not cache.ready(k)  # must NOT be marked complete by T1
    assert st.reads == 2
    st.complete_one(0)  # T2 completes
    cache.service_backlog()
    assert cache.ready(k)
    cache.unpin(k)


def test_allocate_rolls_back_on_exception():
    """An exception escaping allocate() mid-loop must leave no refs taken
    and no entries created (the scheduler completes the task WITHOUT
    release(), so anything left behind is pinned forever)."""
    from bof_tpu.core.task import FnTask
    st = SlowStore()
    cache = TileCache(max_size=1 << 20)
    # warm entry A so the failing allocate takes a ref on it first
    warm = FnTask(lambda task: None)
    warm.add_read(st, 0, SI)
    assert cache.allocate(warm)
    pre_commit = cache.commit_size
    # task touching A (ref path) then B (new path); make B's backlog
    # append explode to simulate a mid-loop failure
    t = FnTask(lambda task: None)
    t.add_read(st, 0, SI)
    t.add_read(st, 8192, SI)

    class Boom(RuntimeError):
        pass

    class ExplodingBacklog(list):
        def append(self, item):
            raise Boom("mid-loop failure")

    cache._backlog = ExplodingBacklog()
    with pytest.raises(Boom):
        cache.allocate(t)
    cache._backlog = __import__("collections").deque()
    # rollback: A's ref back to 1 (warm's), B absent, commit unchanged
    assert cache.commit_size == pre_commit
    assert cache.active_count == 1
    a_key = next(iter(cache._entries))
    assert cache._entries[a_key].refs == 1
