"""Native pinned tile cache (C++ bof_cache) tests."""
import gc

import numpy as np
import pytest

from bof_tpu.io.native import NativeFileStore, load_library
from bof_tpu.io.native_cache import NativeTileCache, PinRouter
from bof_tpu.io.stride import StrideInfo


@pytest.fixture
def store(tmp_path):
    if load_library() is None:
        pytest.skip("native engine unavailable")
    data = np.arange(1 << 18, dtype=np.uint32)
    path = str(tmp_path / "nc.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    st = NativeFileStore(path, n_threads=4)
    yield st, data
    st.close()


def test_pin_ready_buf_roundtrip(store):
    st, data = store
    cache = NativeTileCache(64 << 20)
    sinfo = StrideInfo(stride=4096, n_strides=16, len_per_stride=1024)
    key = cache.pin_read(st, 0, sinfo)
    cache.wait_ready(key)
    buf = cache.buf_sized(key, sinfo.nbytes).view(np.uint32)
    expect = np.concatenate([data[i * 1024:i * 1024 + 256]
                             for i in range(16)])
    np.testing.assert_array_equal(buf, expect)
    # second pin of the same access is a hit
    key2 = cache.pin_read(st, 0, sinfo)
    assert key2 == key
    s = cache.stats()
    assert s["hits"] == 1 and s["misses"] == 1
    cache.unpin(key)
    cache.unpin(key2)
    del buf
    gc.collect()
    cache.close()


def test_eviction_under_budget_and_borrow_safety(store):
    st, data = store
    sinfo = StrideInfo.contiguous(64 << 10)  # 64 KiB tiles
    cache = NativeTileCache(128 << 10)       # budget: 2 tiles
    keys = []
    bufs = []
    for i in range(6):
        k = cache.pin_read(st, i * (64 << 10), sinfo)
        cache.wait_ready(k)
        bufs.append(cache.buf_sized(k, sinfo.nbytes).copy()
                    if i < 3 else cache.buf_sized(k, sinfo.nbytes))
        cache.unpin(k)
        keys.append(k)
    s = cache.stats()
    assert s["evictions"] >= 1
    # borrowed views of evicted entries must still hold valid data
    for i in range(3, 6):
        start = i * (64 << 10) // 4
        np.testing.assert_array_equal(
            bufs[i].view(np.uint32),
            data[start:start + (64 << 10) // 4])
    del bufs
    gc.collect()
    cache.close()


def test_router_mixed_stores(store, tmp_path):
    from bof_tpu.io.store import MemStore
    st, data = store
    mem = MemStore(4096)
    mem.write(0, StrideInfo.contiguous(4096),
              np.arange(1024, dtype=np.uint32).view(np.uint8).ravel()).wait()

    class FakePy:
        """Minimal python-cache stand-in recording calls."""
        def __init__(self):
            self.store = {}
        def pin_read(self, store, off, sinfo):
            k = (off, sinfo)
            self.store[k] = store.read_sync(off, sinfo)
            return k
        def ready(self, k):
            return True
        def buf(self, k):
            return self.store[k]
        def unpin(self, k):
            pass
        def wait_ready(self, k, pump=True):
            pass

    router = PinRouter(FakePy(), NativeTileCache(16 << 20))
    si = StrideInfo.contiguous(1024)
    k_nat = router.pin_read(st, 0, si)
    k_py = router.pin_read(mem, 0, si)
    assert k_nat[0] == "__nat__" and k_py[0] == "__py__"
    router.wait_ready(k_nat)
    np.testing.assert_array_equal(router.buf(k_nat).view(np.uint32),
                                  data[:256])
    np.testing.assert_array_equal(router.buf(k_py).view(np.uint32),
                                  np.arange(256, dtype=np.uint32))
    router.unpin(k_nat)
    router.unpin(k_py)


def test_explicit_native_tile_cache_requires_native_io(tmp_path):
    """tile_cache_backend='native' on the python io backend must raise
    (consistent with io_backend='native'), not silently degrade."""
    import pytest

    from bof_tpu import FlashConfig, FlashContext
    ctx = FlashContext(FlashConfig(scratch_dir=str(tmp_path / "s"),
                                   io_backend="python",
                                   tile_cache_backend="native"))
    try:
        with pytest.raises(RuntimeError, match="native"):
            ctx.pin_cache()
    finally:
        ctx.destroy()


def test_native_prep_kernels_match_numpy():
    """bof_quantize_i8 / bof_cast_bf16 (parallel host prep for the
    compressed transfer modes) must match the numpy/ml_dtypes goldens:
    bf16 bit-exact (both RTNE), int8 within one quantum (f32-vs-f64
    product rounding can flip an exact tie)."""
    import ml_dtypes
    from bof_tpu.io.native import cast_bf16, quantize_i8

    rng = np.random.default_rng(42)
    h = (rng.standard_normal((333, 257)) * 1e3).astype(np.float32)

    q, scale = quantize_i8(h)
    amax = float(np.abs(h).max())
    scale_ref = amax / 127.0
    q_ref = np.rint(h * (1.0 / scale_ref)).astype(np.int8)
    assert abs(scale - scale_ref) / scale_ref < 1e-6
    assert np.abs(q.astype(np.int16) - q_ref.astype(np.int16)).max() <= 1

    b = cast_bf16(h)
    assert b.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(b.view(np.uint16),
                                  h.astype(ml_dtypes.bfloat16)
                                  .view(np.uint16))

    # edges: zero tile (scale 1/127, all-zero output); NaN/inf preserved
    z, sz = quantize_i8(np.zeros((16, 16), np.float32))
    assert abs(sz - 1.0 / 127.0) < 1e-9 and not z.any()
    nn = np.array([np.nan, 1.0, -np.inf], np.float32)
    bn = cast_bf16(nn)
    assert np.isnan(np.float32(bn[0])) and np.isneginf(np.float32(bn[2]))


def test_native_split_f64_i8_matches_numpy():
    """bof_split_f64_i8 (fused fp64 mantissa-slice prep for the sliced
    fp64 gemm) must be BIT-identical to the numpy EFT chain — both are
    sequences of exact fp64 operations, so there is no tolerance."""
    import pytest

    from bof_tpu.io.native import split_f64_i8
    from bof_tpu.ops.gemm64 import _split_slices

    rng = np.random.default_rng(5)
    x = rng.standard_normal((64, 48)) * 10.0 ** rng.uniform(-150, 150,
                                                            (64, 1))
    x[7, :] = 0.0  # all-zero line: frexp exponent 0, slices all zero
    for s in (4, 8):
        # per-line scale (row-major A tiles)
        e = np.frexp(np.abs(x).max(axis=1))[1].astype(np.int32)
        got = split_f64_i8(x, e, True, s)
        if got is None:
            pytest.skip("native engine unavailable")
        want = _split_slices(x, e[:, None], s)
        np.testing.assert_array_equal(got, want)
        # per-column scale (km-storage tiles)
        ec = np.frexp(np.abs(x).max(axis=0))[1].astype(np.int32)
        got_c = split_f64_i8(x, ec, False, s)
        want_c = _split_slices(x, ec[None, :], s)
        np.testing.assert_array_equal(got_c, want_c)


def test_invalidate_orphans_in_flight_read(store):
    """A direct-write invalidation hitting an unpinned entry whose read
    is still in flight must not block the cache mutex on the read (it
    orphans the entry; the buffer is reaped non-blocking later) and a
    re-pin of the same range must re-fetch fresh bytes."""
    st, data = store
    cache = NativeTileCache(64 << 20)
    sinfo = StrideInfo.contiguous(1 << 20)  # 1 MiB: plausibly in flight
    k1 = cache.pin_read(st, 0, sinfo)
    cache.unpin(k1)  # zero pins, read may still be in flight
    dropped = cache.invalidate(st.uid, 0, sinfo.nbytes)
    assert dropped == 1
    # the same access must MISS (fresh entry, fresh read)
    k2 = cache.pin_read(st, 0, sinfo)
    assert k2 != k1
    cache.wait_ready(k2)
    buf = cache.buf_sized(k2, sinfo.nbytes).view(np.uint32).copy()
    np.testing.assert_array_equal(buf, data[:sinfo.nbytes // 4])
    cache.unpin(k2)
    # pumping the cache reaps the orphan once its read lands: entry
    # count returns to just the live one
    import time as _t
    for _ in range(200):
        if cache.stats()["entries"] <= 1:
            break
        k = cache.pin_read(st, 4096, StrideInfo.contiguous(4096))
        cache.wait_ready(k)
        cache.unpin(k)
        cache.invalidate(st.uid, 4096, 8192)
        _t.sleep(0.002)
    assert cache.stats()["entries"] <= 1
    cache.close()
