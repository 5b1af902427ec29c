"""Unit tests for pipeline helpers: PrefetchSeq and HbmCache."""
import numpy as np

from bof_tpu import mem_array
from bof_tpu.core.pipeline import PrefetchSeq
from bof_tpu.ops.gemm import HbmCache


def test_prefetch_seq_in_order(ctx, rng):
    data = rng.standard_normal(4096).astype(np.float32)
    arr = mem_array((4096,), np.float32, data=data, ctx=ctx)
    cache = ctx.scheduler().cache
    accesses = [(arr.store,) + arr.block_access(i * 256, 256)
                for i in range(16)]
    pf = PrefetchSeq(cache, accesses, depth=3)
    for i in range(16):
        buf = pf.get(i).view(np.float32)
        np.testing.assert_array_equal(buf, data[i * 256:(i + 1) * 256])
        pf.done(i)
    pf.close()


def test_prefetch_seq_close_releases(ctx, rng):
    arr = mem_array((1024,), np.float32,
                    data=rng.standard_normal(1024).astype(np.float32),
                    ctx=ctx)
    cache = ctx.scheduler().cache
    accesses = [(arr.store,) + arr.block_access(i * 128, 128)
                for i in range(8)]
    pf = PrefetchSeq(cache, accesses, depth=8)
    pf.get(0)
    pf.close()  # must unpin everything without errors
    cache.flush()


def test_hbm_cache_lru_and_budget():
    class FakeArr:
        def __init__(self, nbytes):
            self.nbytes = nbytes
    c = HbmCache(budget_bytes=300)
    a = FakeArr(100)
    c.put("a", a, 100)
    c.put("b", FakeArr(100), 100)
    c.put("c", FakeArr(100), 100)
    assert c.get("a") is a            # promotes 'a'
    c.put("d", FakeArr(100), 100)     # evicts LRU ('b')
    assert c.get("b") is None
    assert c.get("a") is a
    c.clear()
    assert c.get("a") is None
