"""Cache coherence for direct writes.

The reference flushes the whole Program Cache at every kernel boundary
(reference: src/scheduler/cache.cpp:45-70 via flush_cache), so direct
writes between kernels can never see stale cached tiles.  We retain clean
tiles across kernel calls for reuse, which makes write-path invalidation
load-bearing: every FlashArray write must drop overlapping cached tiles
(python TileCache AND native bof_cache) so later reads re-fetch.
"""
import numpy as np
import pytest

from bof_tpu import FlashConfig, FlashContext, map_array, mem_array
from bof_tpu.io.stride import StrideInfo
from bof_tpu.ops.gemm import gemm


@pytest.fixture
def ctx(tmp_path):
    cfg = FlashConfig(scratch_dir=str(tmp_path / "scratch"),
                      n_io_threads=4, n_compute_threads=2,
                      program_budget=256 << 20)
    c = FlashContext(cfg)
    yield c
    c.destroy()


@pytest.fixture
def pyctx(tmp_path):
    cfg = FlashConfig(scratch_dir=str(tmp_path / "pscratch"),
                      io_backend="python", n_io_threads=4,
                      n_compute_threads=2, program_budget=256 << 20)
    c = FlashContext(cfg)
    yield c
    c.destroy()


def _gemm_rewrite_gemm(A, B, C, a, ctx, rng):
    """gemm, rewrite A directly, gemm again: the second result must see
    the new operand, not a cached tile of the old one."""
    b = B.read_all()
    gemm(A, B, C, blk=32, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), a @ b, rtol=2e-4, atol=1e-5)
    a2 = rng.standard_normal(a.shape).astype(a.dtype)
    A.write_all(a2)
    gemm(A, B, C, blk=32, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), a2 @ b, rtol=2e-4, atol=1e-5)


def test_write_all_invalidates_native_pin_cache(ctx, tmp_path, rng):
    """File-backed arrays on the native backend route pins through the C++
    bof_cache; a direct rewrite of A between gemms must invalidate it."""
    a = rng.standard_normal((64, 64)).astype(np.float32)
    b = rng.standard_normal((64, 64)).astype(np.float32)
    A = map_array(str(tmp_path / "a.bin"), (64, 64), np.float32, "R",
                  create=True, ctx=ctx)
    B = map_array(str(tmp_path / "b.bin"), (64, 64), np.float32, "R",
                  create=True, ctx=ctx)
    C = map_array(str(tmp_path / "c.bin"), (64, 64), np.float32, "R",
                  create=True, ctx=ctx)
    A.write_all(a)
    B.write_all(b)
    _gemm_rewrite_gemm(A, B, C, a, ctx, rng)


def test_write_all_invalidates_python_pin_cache(pyctx, tmp_path, rng):
    a = rng.standard_normal((64, 64)).astype(np.float32)
    b = rng.standard_normal((64, 64)).astype(np.float32)
    A = map_array(str(tmp_path / "pa.bin"), (64, 64), np.float32, "R",
                  create=True, ctx=pyctx)
    B = map_array(str(tmp_path / "pb.bin"), (64, 64), np.float32, "R",
                  create=True, ctx=pyctx)
    C = map_array(str(tmp_path / "pc.bin"), (64, 64), np.float32, "R",
                  create=True, ctx=pyctx)
    A.write_all(a)
    B.write_all(b)
    _gemm_rewrite_gemm(A, B, C, a, pyctx, rng)


def test_mem_array_rewrite_between_gemms(ctx, rng):
    a = rng.standard_normal((48, 48)).astype(np.float32)
    b = rng.standard_normal((48, 48)).astype(np.float32)
    A = mem_array((48, 48), np.float32, "R", data=a, ctx=ctx)
    B = mem_array((48, 48), np.float32, "R", data=b, ctx=ctx)
    C = mem_array((48, 48), np.float32, "R", ctx=ctx)
    _gemm_rewrite_gemm(A, B, C, a, ctx, rng)


def test_partial_block_write_invalidates_only_overlap(ctx, rng):
    """A write_block touching one tile's rows drops exactly the
    overlapping entries; a disjoint cached tile survives (stays a hit)."""
    from bof_tpu.utils import METRICS
    a = rng.standard_normal((64, 64)).astype(np.float32)
    A = mem_array((64, 64), np.float32, "R", data=a, ctx=ctx)
    cache = ctx.pin_cache()
    k_top = cache.pin_read(A.store, *A.block_access(0, 16, 0, 64))
    k_bot = cache.pin_read(A.store, *A.block_access(48, 16, 0, 64))
    cache.wait_ready(k_top)
    cache.wait_ready(k_bot)
    cache.unpin(k_top)
    cache.unpin(k_bot)
    # rewrite rows 0..16: the top tile must drop, the bottom must survive
    A.write_block(0, rng.standard_normal((16, 64)).astype(np.float32))
    before = METRICS.get("cache.hit")
    k2_bot = cache.pin_read(A.store, *A.block_access(48, 16, 0, 64))
    assert METRICS.get("cache.hit") == before + 1, "disjoint tile evicted"
    cache.wait_ready(k2_bot)
    cache.unpin(k2_bot)
    k2_top = cache.pin_read(A.store, *A.block_access(0, 16, 0, 64))
    cache.wait_ready(k2_top)
    got = cache.buf(k2_top).view(np.float32).reshape(16, 64)
    np.testing.assert_array_equal(got, A.read_block(0, 16, 0, 64))
    cache.unpin(k2_top)


def test_dirty_cached_tile_evicts_before_direct_write(ctx, rng):
    """Overlapping dirty write-backs land BEFORE the direct write: final
    disk contents for the overlapped bytes are the direct write's."""
    from bof_tpu.core.cache import TileCache
    from bof_tpu.io.store import MemStore
    cache = TileCache(64 << 20)
    st = MemStore(4096)
    si = StrideInfo.contiguous(1024)
    k = cache.pin_read(st, 0, si)
    cache.wait_ready(k)
    e = cache._entries[k]
    e.buf[:] = 7  # simulate a task's write-back payload
    e.dirty = True
    cache.unpin(k)
    # direct write over the first half of the dirty entry's range
    cache.invalidate_overlap(st, 0, StrideInfo.contiguous(512))
    st.write_sync(0, StrideInfo.contiguous(512),
                  np.full(512, 9, np.uint8))
    got = st.read_sync(0, si)
    assert (got[:512] == 9).all(), "direct write lost to stale write-back"
    assert (got[512:] == 7).all(), "dirty tail not written back"
    assert k not in cache._entries


def test_native_cache_invalidate_unit(tmp_path):
    from bof_tpu.io.native import NativeFileStore, load_library
    from bof_tpu.io.native_cache import NativeTileCache
    if load_library() is None:
        pytest.skip("native engine unavailable")
    data = np.arange(1 << 16, dtype=np.uint32)
    path = str(tmp_path / "inv.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    st = NativeFileStore(path, n_threads=2)
    cache = NativeTileCache(64 << 20)
    si = StrideInfo.contiguous(4096)
    k1 = cache.pin_read(st, 0, si)
    k2 = cache.pin_read(st, 8192, si)
    cache.wait_ready(k1)
    cache.wait_ready(k2)
    cache.unpin(k1)
    cache.unpin(k2)
    # invalidate bytes [0, 4096): k1's tile drops, k2's survives
    assert cache.invalidate(st.uid, 0, 4096) == 1
    st.write_sync(0, si, np.zeros(4096, np.uint8))
    k1b = cache.pin_read(st, 0, si)
    cache.wait_ready(k1b)
    got = cache.buf_sized(k1b, si.nbytes).view(np.uint32)
    assert (got == 0).all(), "stale tile served after invalidate"
    k2b = cache.pin_read(st, 8192, si)
    assert k2b == k2, "disjoint tile should remain a hit"
    cache.unpin(k1b)
    cache.unpin(k2b)
    del got
    import gc
    gc.collect()
    cache.close()
    st.close()


def test_uid_counts_stay_in_sync():
    """invalidate_overlap's O(1) early-out depends on _UidKeyedDict's
    per-uid counts tracking every mutation path (setitem / overwrite /
    del / pop / pop-with-default)."""
    from bof_tpu.core.cache import _UidKeyedDict
    d = _UidKeyedDict()
    d[(1, 0, "a")] = "x"
    d[(1, 8, "b")] = "y"
    d[(2, 0, "a")] = "z"
    assert d.uid_counts == {1: 2, 2: 1}
    d[(1, 0, "a")] = "x2"          # overwrite: no double count
    assert d.uid_counts[1] == 2
    assert d.pop((1, 0, "a")) == "x2"
    assert d.uid_counts == {1: 1, 2: 1}
    assert d.pop((1, 0, "a"), None) is None  # missing w/ default: no-op
    assert d.uid_counts == {1: 1, 2: 1}
    del d[(2, 0, "a")]
    assert 2 not in d.uid_counts
    del d[(1, 8, "b")]
    assert d.uid_counts == {} and d == {}


def test_stale_pinned_tile_drops_at_unpin(ctx, tmp_path, rng):
    """A direct write overlapping a PINNED tile cannot drop it (the pin
    holder owns the buffer — dual-access race window), but the staleness
    must not outlive the pin: once refs hit zero the entry drops and the
    next pin re-fetches fresh bytes.  Exercises the native bof_cache
    stale flag (file-backed store on the native backend)."""
    data = rng.standard_normal(4096).astype(np.float32)
    A = map_array(str(tmp_path / "s.bin"), (4096,), np.float32,
                  create=True, ctx=ctx)
    A.write_all(data)
    cache = ctx.pin_cache()
    off, sinfo = A.block_access(0, 4096)
    pin = cache.pin_read(A.store, off, sinfo)
    cache.wait_ready(pin)
    old = cache.buf(pin).view(np.float32)[:4096].copy()
    np.testing.assert_array_equal(old, data)
    # direct write while pinned: entry survives for the pin holder
    data2 = rng.standard_normal(4096).astype(np.float32)
    A.write_all(data2)
    cache.unpin(pin)           # staleness must die with the pin
    pin2 = cache.pin_read(A.store, off, sinfo)
    cache.wait_ready(pin2)
    got = cache.buf(pin2).view(np.float32)[:4096].copy()
    cache.unpin(pin2)
    np.testing.assert_array_equal(got, data2)


def test_stale_pinned_tile_drops_at_unpin_python(pyctx, tmp_path, rng):
    """Same contract on the Python TileCache (python io backend)."""
    data = rng.standard_normal(2048).astype(np.float32)
    A = map_array(str(tmp_path / "sp.bin"), (2048,), np.float32,
                  create=True, ctx=pyctx)
    A.write_all(data)
    cache = pyctx.pin_cache()
    off, sinfo = A.block_access(0, 2048)
    pin = cache.pin_read(A.store, off, sinfo)
    cache.wait_ready(pin)
    data2 = rng.standard_normal(2048).astype(np.float32)
    A.write_all(data2)
    cache.unpin(pin)
    pin2 = cache.pin_read(A.store, off, sinfo)
    cache.wait_ready(pin2)
    got = cache.buf(pin2).view(np.float32)[:2048].copy()
    cache.unpin(pin2)
    np.testing.assert_array_equal(got, data2)


def test_flash_truncate_invalidates_cut_range(ctx, tmp_path, rng):
    """flash_truncate removes bytes; cached tiles of the cut range must
    not survive — a later re-extension writes new bytes there and a
    retained entry would serve the deleted contents."""
    from bof_tpu import flash_truncate
    data = (np.arange(4096) + 1).astype(np.float32)
    A = map_array(str(tmp_path / "t.bin"), (4096,), np.float32,
                  create=True, ctx=ctx)
    A.write_all(data)
    cache = ctx.pin_cache()
    off, sinfo = A.block_access(2048, 2048)   # cache the tail
    pin = cache.pin_read(A.store, off, sinfo)
    cache.wait_ready(pin)
    cache.unpin(pin)
    T = flash_truncate(A, 2048)
    assert T.shape == (2048,)
    # re-extend with different bytes through the RAW store (bypasses the
    # FlashArray write-path invalidation hook — only flash_truncate's own
    # invalidation protects this read)
    new_tail = np.zeros(2048, np.float32)
    A.store.truncate(4096 * 4)
    A.store.write(2048 * 4, StrideInfo.contiguous(2048 * 4),
                  new_tail.view(np.uint8)).wait()
    A.store.flush()
    pin2 = cache.pin_read(A.store, off, sinfo)
    cache.wait_ready(pin2)
    got = cache.buf(pin2).view(np.float32)[:2048].copy()
    cache.unpin(pin2)
    np.testing.assert_array_equal(got, new_tail)


def test_uid_keyed_dict_rejects_count_blind_mutators():
    from bof_tpu.core.cache import _UidKeyedDict
    d = _UidKeyedDict()
    d[(1, 0, "a")] = "x"
    for call in (d.clear, lambda: d.update({(2, 0, "b"): "y"}),
                 lambda: d.setdefault((3, 0, "c"), "z"), d.popitem):
        with pytest.raises(NotImplementedError):
            call()
    assert d.uid_counts == {1: 1}


def test_map_array_zero_line_shape(ctx, tmp_path):
    A = map_array(str(tmp_path / "z.bin"), (0, 64), np.float32, "R",
                  create=True, ctx=ctx, ld=128)
    assert A.shape == (0, 64)
