"""Scheduler/cache/prioritizer pipeline tests.

Exercises the 5-stage task pipeline against file and memory stores:
dependencies, continuation chains, budget-bounded eviction with write-back,
and failure propagation.
"""
import threading

import numpy as np
import pytest

from bof_tpu.core.task import FnTask, TaskStatus, access_key
from bof_tpu.io.stride import StrideInfo


def make_sched(ctx):
    return ctx.scheduler()


def test_simple_map_task(ctx, rng):
    """One task doubling a block in place: read + write same access."""
    from bof_tpu import mem_array
    arr = mem_array((1024,), np.float32,
                    data=rng.standard_normal(1024).astype(np.float32), ctx=ctx)
    ref = arr.read_all().copy()
    sched = make_sched(ctx)

    off, sinfo = arr.block_access(0, 1024)

    def run(task):
        buf = task.buf(arr.store, off, sinfo, np.float32)
        buf *= 2.0

    t = FnTask(run)
    t.add_read(arr.store, off, sinfo)
    t.add_write(arr.store, off, sinfo)
    sched.add_task(t)
    sched.wait_for([t])
    sched.flush_cache()
    np.testing.assert_allclose(arr.read_all(), ref * 2.0)


def test_dependency_chain_order(ctx):
    """Parents gate children (reference: accumulate chains,
    gemm.cpp:114-126)."""
    from bof_tpu import mem_array
    arr = mem_array((128,), np.float32, data=np.zeros(128, np.float32),
                    ctx=ctx)
    sched = make_sched(ctx)
    off, sinfo = arr.block_access(0, 128)
    order = []
    lock = threading.Lock()

    tasks = []
    prev = None
    for i in range(8):
        def run(task, i=i):
            with lock:
                order.append(i)
            buf = task.buf(arr.store, off, sinfo, np.float32)
            buf += float(i + 1)
        t = FnTask(run)
        t.add_read(arr.store, off, sinfo)
        t.add_write(arr.store, off, sinfo)
        if prev is not None:
            t.add_parent(prev.id)
        tasks.append(t)
        prev = t
    sched.add_tasks(tasks)
    sched.wait_for(tasks)
    sched.flush_cache()
    assert order == list(range(8))
    np.testing.assert_allclose(arr.read_all(), np.full(128, 36.0))


def test_continuation_chain(ctx):
    """task.next runs after completion (reference: add_next,
    task.h:79-84)."""
    from bof_tpu import mem_array
    arr = mem_array((64,), np.float32, data=np.ones(64, np.float32), ctx=ctx)
    sched = make_sched(ctx)
    off, sinfo = arr.block_access(0, 64)

    def mul(task):
        task.buf(arr.store, off, sinfo, np.float32)[:] *= 3.0

    t1, t2 = FnTask(mul), FnTask(mul)
    for t in (t1, t2):
        t.add_read(arr.store, off, sinfo)
        t.add_write(arr.store, off, sinfo)
    t1.add_next(t2)
    sched.add_task(t1)
    sched.wait_for([t1, t2])
    sched.flush_cache()
    np.testing.assert_allclose(arr.read_all(), np.full(64, 9.0))


def test_budget_eviction_writeback(tmp_path, rng):
    """Working set exceeds the budget: tiles must be evicted with
    write-back and re-read; final file contents must be exact."""
    from bof_tpu import FlashConfig, FlashContext, map_array
    cfg = FlashConfig(scratch_dir=str(tmp_path / "s"), n_io_threads=4,
                      n_compute_threads=2,
                      program_budget=1 << 20)  # 1 MiB budget
    ctx = FlashContext(cfg)
    try:
        n_blocks, blk = 16, 64 * 1024 // 4  # 16 blocks x 64 KiB = 1 MiB data
        arr = map_array(str(tmp_path / "d.bin"), (n_blocks * blk,),
                        np.float32, create=True, ctx=ctx)
        init = rng.standard_normal(n_blocks * blk).astype(np.float32)
        arr.write_all(init)
        sched = ctx.scheduler()
        tasks = []
        # two passes over all blocks; pass 2 depends on pass 1 per block
        for p in range(2):
            for b in range(n_blocks):
                off, sinfo = arr.block_access(b * blk, blk)

                def run(task, off=off, sinfo=sinfo):
                    task.buf(arr.store, off, sinfo, np.float32)[:] += 1.0
                t = FnTask(run)
                t.add_read(arr.store, off, sinfo)
                t.add_write(arr.store, off, sinfo)
                if p == 1:
                    t.add_parent(tasks[b].id)
                tasks.append(t)
        sched.add_tasks(tasks)
        sched.wait_for(tasks, timeout=60)
        sched.flush_cache()
        expect = (init + np.float32(1.0)) + np.float32(1.0)  # fp32 assoc
        np.testing.assert_allclose(arr.read_all(), expect, rtol=0)
        assert sched.cache.commit_size <= cfg.program_budget
    finally:
        ctx.destroy()


def test_oversized_task_fails_cleanly(ctx):
    from bof_tpu import mem_array
    sched = make_sched(ctx)
    arr = mem_array((1,), np.float32, ctx=ctx)
    t = FnTask(lambda task: None)
    # fake access larger than the 256 MiB test budget
    t.add_read(arr.store, 0, StrideInfo(stride=1 << 20, n_strides=512,
                                        len_per_stride=1 << 20))
    sched.add_task(t)
    with pytest.raises(RuntimeError):
        sched.wait_for([t], timeout=30)


def test_failing_task_propagates(ctx):
    from bof_tpu import mem_array
    arr = mem_array((16,), np.float32, ctx=ctx)
    sched = make_sched(ctx)
    off, sinfo = arr.block_access(0, 16)

    def boom(task):
        raise ValueError("kaboom")
    t = FnTask(boom)
    t.add_read(arr.store, off, sinfo)
    sched.add_task(t)
    with pytest.raises(RuntimeError):
        sched.wait_for([t], timeout=30)


def test_shared_tile_reuse(ctx, rng):
    """Tasks sharing a read tile hit the cache, not the store."""
    from bof_tpu import mem_array
    from bof_tpu.utils import METRICS
    arr = mem_array((256,), np.float32,
                    data=rng.standard_normal(256).astype(np.float32), ctx=ctx)
    out = mem_array((8,), np.float32, data=np.zeros(8, np.float32), ctx=ctx)
    sched = make_sched(ctx)
    off, sinfo = arr.block_access(0, 256)
    METRICS.reset()
    tasks = []
    for i in range(8):
        ooff, osinfo = out.block_access(i, 1)

        def run(task, ooff=ooff, osinfo=osinfo):
            x = task.buf(arr.store, off, sinfo, np.float32)
            task.buf(out.store, ooff, osinfo, np.float32)[:] = x.sum()
        t = FnTask(run)
        t.add_read(arr.store, off, sinfo)
        t.add_write(out.store, ooff, osinfo)
        tasks.append(t)
    sched.add_tasks(tasks)
    sched.wait_for(tasks)
    sched.flush_cache()
    expect = arr.read_all().sum()
    np.testing.assert_allclose(out.read_all(), np.full(8, expect), rtol=1e-6)
    snap = METRICS.snapshot()
    assert snap.get("cache.hit", 0) >= 7  # shared tile fetched once


def test_single_use_discard_option(tmp_path, rng):
    """single_use_discard frees clean tiles at zero refs instead of
    keeping them evictable (reference: SchedulerOptions, scheduler.h:79)."""
    from bof_tpu import FlashConfig, FlashContext, mem_array
    cfg = FlashConfig(scratch_dir=str(tmp_path / "s"), n_io_threads=2,
                      n_compute_threads=2, single_use_discard=True)
    ctx = FlashContext(cfg)
    try:
        arr = mem_array((4096,), np.float32,
                        data=rng.standard_normal(4096).astype(np.float32),
                        ctx=ctx)
        out = mem_array((4,), np.float32, data=np.zeros(4, np.float32),
                        ctx=ctx)
        sched = ctx.scheduler()
        tasks = []
        for i in range(4):
            off, sinfo = arr.block_access(i * 1024, 1024)
            ooff, osin = out.block_access(i, 1)

            def run(task, off=off, sinfo=sinfo, ooff=ooff, osin=osin):
                x = task.buf(arr.store, off, sinfo, np.float32)
                task.buf(out.store, ooff, osin, np.float32)[:] = x.sum()
            t = FnTask(run)
            t.add_read(arr.store, off, sinfo)
            t.add_write(out.store, ooff, osin)
            tasks.append(t)
        sched.add_tasks(tasks)
        sched.wait_for(tasks)
        sched.flush_cache()
        ref = arr.read_all().reshape(4, 1024).sum(1)
        np.testing.assert_allclose(out.read_all(), ref, rtol=1e-6)
        # read-only tiles were discarded at release, not parked in LRU
        assert sched.cache.commit_size <= 4 * 4  # only the tiny out tiles
    finally:
        ctx.destroy()


def test_fcfs_prioritizer_disabled(tmp_path, rng):
    from bof_tpu import FlashConfig, FlashContext, mem_array
    cfg = FlashConfig(scratch_dir=str(tmp_path / "s2"), n_io_threads=2,
                      n_compute_threads=1, enable_prioritizer=False)
    ctx = FlashContext(cfg)
    try:
        arr = mem_array((1000,), np.float32,
                        data=np.arange(1000, dtype=np.float32), ctx=ctx)
        sched = ctx.scheduler()
        tasks = []
        for i in range(10):
            off, sinfo = arr.block_access(i * 100, 100)

            def run(task, off=off, sinfo=sinfo):
                task.buf(arr.store, off, sinfo, np.float32)[:] += 1.0
            t = FnTask(run)
            t.add_read(arr.store, off, sinfo)
            t.add_write(arr.store, off, sinfo)
            tasks.append(t)
        sched.add_tasks(tasks)
        sched.wait_for(tasks)
        sched.flush_cache()
        np.testing.assert_allclose(arr.read_all(),
                                   np.arange(1000, dtype=np.float32) + 1.0)
    finally:
        ctx.destroy()


def test_failure_cascades_to_children_and_continuations(ctx):
    """Children of a failed parent and chained continuations must fail
    instead of computing over never-produced inputs."""
    from bof_tpu import mem_array
    arr = mem_array((16,), np.float32, ctx=ctx)
    sched = make_sched(ctx)
    off, sinfo = arr.block_access(0, 16)

    def boom(task):
        raise ValueError("boom")

    parent = FnTask(boom)
    parent.add_read(arr.store, off, sinfo)
    child = FnTask(lambda task: None)
    child.add_read(arr.store, off, sinfo)
    child.add_parent(parent.id)
    cont = FnTask(lambda task: None)
    cont.add_read(arr.store, off, sinfo)
    parent.add_next(cont)
    sched.add_tasks([parent, child])
    with pytest.raises(RuntimeError):
        sched.wait_for([parent], timeout=30)
    with pytest.raises(RuntimeError):
        sched.wait_for([child], timeout=30)
    with pytest.raises(RuntimeError):
        sched.wait_for([cont], timeout=30)


def test_oversized_pin_raises(ctx):
    from bof_tpu import mem_array
    arr = mem_array((16,), np.float32, ctx=ctx)
    cache = ctx.scheduler().cache
    with pytest.raises(MemoryError):
        cache.pin_read(arr.store, 0,
                       StrideInfo(stride=1 << 20, n_strides=512,
                                  len_per_stride=1 << 20))


class _FailingStore:
    """Store whose reads always fail — exercises I/O error propagation."""

    def __init__(self, inner, fail_async=True):
        self._inner = inner
        self._fail_async = fail_async
        # note: no uid attr — store_uid() assigns one lazily

    def read(self, offset, sinfo, out):
        if not self._fail_async:
            raise IOError("synchronous read explosion")
        from bof_tpu.io.store import Ticket
        t = Ticket(out)
        t._complete("injected read failure")
        return t

    def write(self, offset, sinfo, src):
        return self._inner.write(offset, sinfo, src)

    def read_sync(self, offset, sinfo):
        from bof_tpu.io.store import BaseStore
        return BaseStore.read_sync(self, offset, sinfo)

    def flush(self):
        pass


@pytest.mark.parametrize("fail_async", [True, False])
def test_io_error_fails_task_not_hangs(ctx, fail_async):
    """A failing read must surface as task.error via wait_for — the old
    behavior wedged the cache and hung the waiter forever."""
    from bof_tpu import mem_array
    base = mem_array((64,), np.float32, data=np.ones(64, np.float32),
                     ctx=ctx)
    bad = _FailingStore(base.store, fail_async=fail_async)
    sched = make_sched(ctx)
    off, sinfo = base.block_access(0, 64)
    t = FnTask(lambda task: None)
    t.add_read(bad, off, sinfo)
    sched.add_task(t)
    with pytest.raises(RuntimeError):
        sched.wait_for([t], timeout=30)


def test_io_error_surfaces_through_pin_path(ctx):
    from bof_tpu import mem_array
    base = mem_array((64,), np.float32, ctx=ctx)
    bad = _FailingStore(base.store)
    cache = ctx.scheduler().cache
    off, sinfo = base.block_access(0, 64)
    key = cache.pin_read(bad, off, sinfo)
    with pytest.raises(IOError):
        cache.wait_ready(key, pump=True)
    cache.unpin(key)


def test_failed_read_task_does_not_corrupt_store_on_flush(ctx, rng):
    """A read+write task whose read fails must NOT have its uninitialized
    write buffer flushed over previously-valid bytes (dirty is only set on
    successful release — the reference exits on I/O failure so can never
    hit this; we keep running and must stay consistent)."""
    from bof_tpu import mem_array
    good = mem_array((64,), np.float32,
                     data=np.arange(64, dtype=np.float32), ctx=ctx)
    bad_base = mem_array((64,), np.float32, ctx=ctx)
    bad = _FailingStore(bad_base.store)
    sched = make_sched(ctx)
    r_off, r_si = bad_base.block_access(0, 64)
    w_off, w_si = good.block_access(0, 64)
    t = FnTask(lambda task: None)
    t.add_read(bad, r_off, r_si)
    t.add_write(good.store, w_off, w_si)
    sched.add_task(t)
    with pytest.raises(RuntimeError):
        sched.wait_for([t], timeout=30)
    sched.flush_cache()  # must not raise and must not write garbage
    np.testing.assert_array_equal(good.read_all(),
                                  np.arange(64, dtype=np.float32))


def test_failed_execute_does_not_corrupt_store_on_flush(ctx):
    """Same guarantee when execute() itself raises: the write entry stays
    clean, prior file contents survive the flush."""
    from bof_tpu import mem_array
    good = mem_array((64,), np.float32,
                     data=np.arange(64, dtype=np.float32), ctx=ctx)
    sched = make_sched(ctx)
    w_off, w_si = good.block_access(0, 64)

    def explode(task):
        raise ValueError("compute failure")

    t = FnTask(explode)
    t.add_write(good.store, w_off, w_si)
    sched.add_task(t)
    with pytest.raises(RuntimeError):
        sched.wait_for([t], timeout=30)
    sched.flush_cache()
    np.testing.assert_array_equal(good.read_all(),
                                  np.arange(64, dtype=np.float32))


def test_successful_task_still_writes_back(ctx):
    """Counterpart: dirty-on-success must still persist completed work."""
    from bof_tpu import mem_array
    out = mem_array((64,), np.float32, ctx=ctx)
    sched = make_sched(ctx)
    w_off, w_si = out.block_access(0, 64)

    def fill(task):
        buf = task.buffers[access_key(out.store, w_off, w_si)]
        buf.view(np.float32)[:] = 7.0

    t = FnTask(fill)
    t.add_write(out.store, w_off, w_si)
    sched.add_task(t)
    sched.wait_for([t], timeout=30)
    sched.flush_cache()
    np.testing.assert_array_equal(out.read_all(),
                                  np.full(64, 7.0, np.float32))


def test_compute_pool_shrink_midstream(ctx):
    """Pool shrink via poison pills (reference: scheduler.cpp:284-296):
    shrinking mid-stream loses no tasks and the pool really drains."""
    import time
    from bof_tpu import mem_array
    sched = make_sched(ctx)
    sched.set_num_compute_threads(4)
    done = []
    lock = threading.Lock()

    def work(task):
        time.sleep(0.005)
        with lock:
            done.append(task.id)

    tasks = [FnTask(work) for _ in range(40)]
    sched.add_tasks(tasks[:20])
    sched.set_num_compute_threads(1)  # shrink while tasks are in flight
    sched.add_tasks(tasks[20:])
    sched.wait_for(tasks, timeout=60)
    assert len(done) == 40
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        alive = [t for t in sched._compute_threads if t.is_alive()]
        if len(alive) <= 1 and sched._pending_pills == 0:
            break
        time.sleep(0.01)
    alive = [t for t in sched._compute_threads if t.is_alive()]
    assert len(alive) == 1 and sched._pending_pills == 0
    # grow again: new work still executes
    sched.set_num_compute_threads(3)
    more = [FnTask(work) for _ in range(10)]
    sched.add_tasks(more)
    sched.wait_for(more, timeout=60)
    assert len(done) == 50


def test_failed_write_entry_not_served_from_cache(ctx):
    """A failed task's write tile must be dropped from the cache, not
    parked as a clean complete entry: a later reader of the same tile
    must get real file contents, not the failed task's garbage buffer."""
    from bof_tpu import mem_array
    arr = mem_array((64,), np.float32,
                    data=np.arange(64, dtype=np.float32), ctx=ctx)
    sched = make_sched(ctx)
    off, sinfo = arr.block_access(0, 64)

    def explode(task):
        buf = task.buffers[access_key(arr.store, off, sinfo)]
        buf.view(np.float32)[:] = -1.0  # partial garbage, then fail
        raise ValueError("boom")

    t1 = FnTask(explode)
    t1.add_write(arr.store, off, sinfo)
    sched.add_task(t1)
    with pytest.raises(RuntimeError):
        sched.wait_for([t1], timeout=30)

    got = {}

    def read_back(task):
        buf = task.buffers[access_key(arr.store, off, sinfo)]
        got["v"] = buf.view(np.float32).copy()

    t2 = FnTask(read_back)  # independent task, same access
    t2.add_read(arr.store, off, sinfo)
    sched.add_task(t2)
    sched.wait_for([t2], timeout=30)
    np.testing.assert_array_equal(got["v"], np.arange(64, dtype=np.float32))


class _HealingStore:
    """Read fails the first `n_fail` times, then serves from the inner
    store — models a transient I/O error."""

    def __init__(self, inner, n_fail=1):
        self._inner = inner
        self._left = n_fail

    def read(self, offset, sinfo, out):
        if self._left > 0:
            self._left -= 1
            from bof_tpu.io.store import Ticket
            t = Ticket(out)
            t._complete("transient read failure")
            return t
        return self._inner.read(offset, sinfo, out)

    def write(self, offset, sinfo, src):
        return self._inner.write(offset, sinfo, src)

    def flush(self):
        pass


def test_transient_read_error_refetches_on_retry(ctx):
    """A failed read must not be served as a stale error forever: after
    the erroring pin is released, a retry re-fetches and succeeds (parity
    with the native cache's poison containment)."""
    from bof_tpu import mem_array
    base = mem_array((64,), np.float32,
                     data=np.arange(64, dtype=np.float32), ctx=ctx)
    healing = _HealingStore(base.store, n_fail=1)
    cache = ctx.scheduler().cache
    off, sinfo = base.block_access(0, 64)
    key = cache.pin_read(healing, off, sinfo)
    with pytest.raises(IOError):
        cache.wait_ready(key, pump=True)
    cache.unpin(key)  # errored entry drops here
    key2 = cache.pin_read(healing, off, sinfo)
    cache.wait_ready(key2, pump=True)
    got = cache.buf(key2).view(np.float32).copy()
    cache.unpin(key2)
    np.testing.assert_array_equal(got, np.arange(64, dtype=np.float32))


def test_eviction_write_error_contained_and_reported(ctx, rng):
    """A store whose write raises synchronously during dirty eviction must
    not wedge the scheduler or corrupt cache accounting: the evicting task
    proceeds, and the LOST write-back surfaces from flush_cache() as an
    IOError (data-not-persisted is never silent)."""
    from bof_tpu import FlashConfig, FlashContext, mem_array

    class _WriteExplodes:
        def __init__(self, inner):
            self._inner = inner

        def read(self, offset, sinfo, out):
            return self._inner.read(offset, sinfo, out)

        def write(self, offset, sinfo, src):
            raise IOError("write explosion during eviction")

        def flush(self):
            pass

    small = FlashContext(FlashConfig(scratch_dir=ctx.config.scratch_dir,
                                     program_budget=768,
                                     n_compute_threads=1))
    try:
        sched = small.scheduler()
        base = mem_array((128,), np.float32, ctx=small)
        bad = _WriteExplodes(base.store)
        off, sinfo = base.block_access(0, 128)  # 512 B

        def fill(task):
            task.buffers[access_key(bad, off, sinfo)].view(
                np.float32)[:] = 1.0

        t1 = FnTask(fill)  # dirty tile on the exploding store
        t1.add_write(bad, off, sinfo)
        sched.add_task(t1)
        sched.wait_for([t1], timeout=30)

        # t2 (512 B) over the 768 B budget forces eviction of t1's dirty
        # tile; the store's write raises — contained, t2 still completes
        other = mem_array((128,), np.float32, ctx=small)
        off2, sinfo2 = other.block_access(0, 128)
        t2 = FnTask(lambda task: None)
        t2.add_write(other.store, off2, sinfo2)
        sched.add_task(t2)
        sched.wait_for([t2], timeout=30)
        with pytest.raises(IOError, match="NOT fully persisted"):
            sched.flush_cache()
    finally:
        try:
            small.destroy()
        except IOError:
            pass


def test_completion_record_bitmap():
    """Bitmap semantics across growth boundaries (reference scheduler.h
    :20-68 structure): ids far apart, re-mark idempotent, unmarked ids
    within allocated range stay incomplete."""
    from bof_tpu.core.scheduler import CompletionRecord
    cr = CompletionRecord()
    for tid in (0, 7, 8, 8191, 8192, 123_456, 1_000_003):
        assert not cr.is_complete(tid)
        cr.mark(tid)
        cr.mark(tid)
        assert cr.is_complete(tid)
    assert not cr.is_complete(1_000_002)
    assert cr.all_complete([0, 8191, 1_000_003])
    assert not cr.all_complete([0, 999_999])
