"""Randomized storage-layer correctness tests.

Re-creation of the reference's I/O test strategy (reference:
misc/flash_file_handle_test.cpp — iota-filled file, randomized
read/write/sread/swrite trials verified against the arithmetic pattern),
parametrized over every backend: MemStore, PyFileStore, NativeFileStore
(buffered and O_DIRECT).
"""
import os

import numpy as np
import pytest

from bof_tpu.io.store import MemStore, Ticket
from bof_tpu.io.stride import StrideInfo

FILE_ELEMS = 1 << 18  # 256K uint32 = 1 MiB


def iota_file(n=FILE_ELEMS):
    return np.arange(n, dtype=np.uint32)


def make_store(kind, tmp_path, data):
    raw = data.view(np.uint8).ravel()
    if kind == "mem":
        st = MemStore(raw.nbytes)
        st.write(0, StrideInfo.contiguous(raw.nbytes), raw).wait()
        return st
    path = str(tmp_path / f"io_{kind}.bin")
    with open(path, "wb") as f:
        f.write(raw.tobytes())
    if kind == "py":
        from bof_tpu.io.pystore import PyFileStore, PyIoPool
        pool = PyIoPool(4)
        return PyFileStore(path, pool)
    from bof_tpu.io.native import NativeFileStore, load_library
    if load_library() is None:
        pytest.skip("native engine unavailable")
    return NativeFileStore(path, o_direct=(kind == "native_direct"),
                           n_threads=4)

BACKENDS = ["mem", "py", "native", "native_direct"]


@pytest.mark.parametrize("kind", BACKENDS)
def test_contiguous_read_randomized(kind, tmp_path, rng):
    data = iota_file()
    st = make_store(kind, tmp_path, data)
    for _ in range(50):
        # random unaligned offsets/lengths in elements
        start = int(rng.integers(0, FILE_ELEMS - 2))
        n = int(rng.integers(1, min(FILE_ELEMS - start, 5000)))
        out = st.read_sync(start * 4, StrideInfo.contiguous(n * 4))
        np.testing.assert_array_equal(out.view(np.uint32),
                                      np.arange(start, start + n,
                                                dtype=np.uint32))
    st.close()


@pytest.mark.parametrize("kind", BACKENDS)
def test_strided_read_randomized(kind, tmp_path, rng):
    data = iota_file()
    st = make_store(kind, tmp_path, data)
    for _ in range(50):
        len_el = int(rng.integers(1, 200))
        stride_el = len_el + int(rng.integers(0, 300))
        max_strides = (FILE_ELEMS - len_el) // max(stride_el, 1)
        if max_strides < 1:
            continue
        n_str = int(rng.integers(1, min(max_strides, 64) + 1))
        base = int(rng.integers(
            0, FILE_ELEMS - ((n_str - 1) * stride_el + len_el) + 1))
        sinfo = StrideInfo(stride=stride_el * 4, n_strides=n_str,
                           len_per_stride=len_el * 4)
        out = st.read_sync(base * 4, sinfo).view(np.uint32)
        expect = np.concatenate([
            np.arange(base + i * stride_el, base + i * stride_el + len_el,
                      dtype=np.uint32) for i in range(n_str)])
        np.testing.assert_array_equal(out, expect)
    st.close()


@pytest.mark.parametrize("kind", BACKENDS)
def test_write_read_back_randomized(kind, tmp_path, rng):
    data = iota_file()
    st = make_store(kind, tmp_path, data)
    shadow = data.copy()
    for _ in range(40):
        start = int(rng.integers(0, FILE_ELEMS - 2))
        n = int(rng.integers(1, min(FILE_ELEMS - start, 3000)))
        vals = rng.integers(0, 2**32, n, dtype=np.uint32)
        st.write_sync(start * 4, StrideInfo.contiguous(n * 4),
                      vals.view(np.uint8).ravel())
        shadow[start:start + n] = vals
        # verify a superset region (reference DEBUG read-back verify)
        lo = max(0, start - 100)
        hi = min(FILE_ELEMS, start + n + 100)
        got = st.read_sync(lo * 4, StrideInfo.contiguous((hi - lo) * 4))
        np.testing.assert_array_equal(got.view(np.uint32), shadow[lo:hi])
    st.close()


@pytest.mark.parametrize("kind", BACKENDS)
def test_strided_write_randomized(kind, tmp_path, rng):
    data = iota_file()
    st = make_store(kind, tmp_path, data)
    shadow = data.copy()
    for _ in range(30):
        len_el = int(rng.integers(1, 100))
        stride_el = len_el + int(rng.integers(0, 200))
        n_str = int(rng.integers(1, 32))
        extent = (n_str - 1) * stride_el + len_el
        if extent >= FILE_ELEMS:
            continue
        base = int(rng.integers(0, FILE_ELEMS - extent))
        vals = rng.integers(0, 2**32, n_str * len_el, dtype=np.uint32)
        sinfo = StrideInfo(stride=stride_el * 4, n_strides=n_str,
                           len_per_stride=len_el * 4)
        st.write_sync(base * 4, sinfo, vals.view(np.uint8).ravel())
        for i in range(n_str):
            shadow[base + i * stride_el:base + i * stride_el + len_el] = \
                vals[i * len_el:(i + 1) * len_el]
        got = st.read_sync(0, StrideInfo.contiguous(FILE_ELEMS * 4))
        np.testing.assert_array_equal(got.view(np.uint32), shadow)
    st.close()


@pytest.mark.parametrize("kind", ["py", "native", "native_direct"])
def test_concurrent_async_reads(kind, tmp_path, rng):
    """Many tickets in flight at once (exercises the queue + pool)."""
    data = iota_file()
    st = make_store(kind, tmp_path, data)
    tickets = []
    bufs = []
    metas = []
    for _ in range(64):
        start = int(rng.integers(0, FILE_ELEMS - 1000))
        n = int(rng.integers(1, 1000))
        buf = np.empty(n * 4, dtype=np.uint8)
        tickets.append(st.read(start * 4, StrideInfo.contiguous(n * 4), buf))
        bufs.append(buf)
        metas.append((start, n))
    for t, buf, (start, n) in zip(tickets, bufs, metas):
        t.wait()
        np.testing.assert_array_equal(
            buf.view(np.uint32), np.arange(start, start + n, dtype=np.uint32))
    st.close()


def test_concurrent_unaligned_direct_writes(tmp_path, rng):
    """Adjacent unaligned O_DIRECT writes sharing boundary sectors must not
    corrupt each other — the reference's write-write overlap hazard
    (reference: io_executor.cpp:249-361); we serialize via sector-interval
    locks in the native engine."""
    from bof_tpu.io.native import NativeFileStore, load_library
    if load_library() is None:
        pytest.skip("native engine unavailable")
    n = 1 << 16
    data = np.zeros(n, dtype=np.uint32)
    path = str(tmp_path / "ww.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    st = NativeFileStore(path, o_direct=True, n_threads=8)
    # adjacent runs of 77 elements (308 B, never sector aligned)
    run = 77
    tickets = []
    for i in range(n // run):
        vals = np.full(run, i + 1, dtype=np.uint32)
        tickets.append(st.write(i * run * 4,
                                StrideInfo.contiguous(run * 4),
                                vals.view(np.uint8).ravel()))
    for t in tickets:
        t.wait()
    got = st.read_sync(0, StrideInfo.contiguous((n // run) * run * 4))
    got = got.view(np.uint32)
    for i in range(n // run):
        np.testing.assert_array_equal(got[i * run:(i + 1) * run], i + 1)
    st.close()


def test_memstore_grows_on_write():
    st = MemStore(16)
    vals = np.arange(8, dtype=np.uint32)
    st.write_sync(8, StrideInfo.contiguous(32), vals.view(np.uint8).ravel())
    assert st.size() == 40
    got = st.read_sync(8, StrideInfo.contiguous(32)).view(np.uint32)
    np.testing.assert_array_equal(got, vals)


def test_kernel_aio_strided_path(tmp_path, rng, monkeypatch):
    """Fully-aligned O_DIRECT strided access takes the io_submit path
    (observable via the engine's aio op counter) and returns exact data.
    Span coalescing is disabled so the AIO path itself stays covered (this
    access pattern is span-eligible since r3)."""
    import ctypes
    from bof_tpu.io.native import (NativeFileStore, alloc_aligned,
                                   load_library)
    monkeypatch.setenv("BOF_NO_SPAN_COALESCE", "1")
    lib = load_library()
    if lib is None:
        pytest.skip("native engine unavailable")
    lib.bof_aio_ops.restype = ctypes.c_longlong
    n = 1 << 20  # 4 MiB of uint32
    data = np.arange(n, dtype=np.uint32)
    path = str(tmp_path / "aio.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    st = NativeFileStore(path, o_direct=True, n_threads=4)
    before = lib.bof_aio_ops()
    # 128 runs of 2 sectors, stride 8 sectors — all aligned
    sinfo = StrideInfo(stride=4096, n_strides=128, len_per_stride=1024)
    out = alloc_aligned(sinfo.nbytes)
    st.read(0, sinfo, out).wait()
    after = lib.bof_aio_ops()
    expect = np.concatenate([data[i * 1024: i * 1024 + 256]
                             for i in range(128)])
    np.testing.assert_array_equal(out.view(np.uint32), expect)
    assert after > before, "aligned strided read did not use kernel AIO"
    # aligned strided write through AIO, verified by read-back
    vals = rng.integers(0, 2**32, 128 * 256, dtype=np.uint32)
    src = alloc_aligned(sinfo.nbytes)
    src[:] = vals.view(np.uint8)
    st.write(0, sinfo, src).wait()
    got = st.read_sync(0, StrideInfo.contiguous(n * 4)).view(np.uint32)
    shadow = data.copy()
    for i in range(128):
        shadow[i * 1024:i * 1024 + 256] = vals[i * 256:(i + 1) * 256]
    np.testing.assert_array_equal(got, shadow)
    st.close()


def test_span_coalesced_strided_read(tmp_path, rng):
    """Dense small-run strided O_DIRECT reads (fill >= 25%) are served by
    one sequential span read + host scatter (bof_io.cpp span_read) — the
    read-side analog of the reference's write-time stride merging
    (flash_file_handle.cpp:508-716).  Exact data, including a span whose
    tail stride gap crosses EOF, and unaligned offsets."""
    import ctypes
    from bof_tpu.io.native import NativeFileStore, load_library
    lib = load_library()
    if lib is None:
        pytest.skip("native engine unavailable")
    lib.bof_span_ops.restype = ctypes.c_longlong
    n = (12 << 20) // 4
    data = rng.integers(0, 2**32, n, dtype=np.uint32)
    path = str(tmp_path / "span.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    st = NativeFileStore(path, o_direct=True, n_threads=4)
    before = lib.bof_span_ops()
    # matrix-tile shape: 16 KiB rows, 48 KiB apart (fill 1/3)
    sinfo = StrideInfo(stride=48 << 10, n_strides=64,
                       len_per_stride=16 << 10)
    got = st.read_sync(0, sinfo).view(np.uint32)
    expect = np.concatenate([
        data[i * (48 << 10) // 4: i * (48 << 10) // 4 + (16 << 10) // 4]
        for i in range(64)])
    np.testing.assert_array_equal(got, expect)
    assert lib.bof_span_ops() > before, "span path did not engage"
    # unaligned offset + last run's span tail extending past EOF
    file_end = n * 4
    off = file_end - 63 * (48 << 10) - 100  # 64th run ends 100 B shy of EOF
    sinfo2 = StrideInfo(stride=48 << 10, n_strides=64, len_per_stride=4096)
    got2 = st.read_sync(off, sinfo2).view(np.uint8)
    raw = data.view(np.uint8)
    pieces = []
    for i in range(64):  # bytes past EOF read back as zeros
        part = raw[off + i * (48 << 10): off + i * (48 << 10) + 4096]
        pieces.append(np.pad(part, (0, 4096 - len(part))))
    np.testing.assert_array_equal(got2, np.concatenate(pieces))
    st.close()


def test_grouping_with_small_max_chunk(tmp_path, rng):
    """Regression: max_chunk < len_per_stride < 1MiB used to group runs
    but only execute the first of each group (silent corruption)."""
    from bof_tpu.io.native import NativeFileStore, load_library
    if load_library() is None:
        pytest.skip("native engine unavailable")
    n = (4 << 20) // 4  # 4 MiB of uint32
    data = np.arange(n, dtype=np.uint32)
    path = str(tmp_path / "gc.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    st = NativeFileStore(path, n_threads=4, max_chunk_bytes=256 << 10)
    run_el = (512 << 10) // 4          # 512 KiB runs > max_chunk
    sinfo = StrideInfo(stride=(512 << 10), n_strides=8,
                       len_per_stride=(512 << 10))
    got = st.read_sync(0, sinfo).view(np.uint32)
    np.testing.assert_array_equal(got, data[:8 * run_el])
    # also a truly strided variant (gaps between runs)
    sinfo2 = StrideInfo(stride=(768 << 10), n_strides=5,
                        len_per_stride=(512 << 10))
    got2 = st.read_sync(0, sinfo2).view(np.uint32)
    expect = np.concatenate([
        data[i * (768 << 10) // 4:i * (768 << 10) // 4 + run_el]
        for i in range(5)])
    np.testing.assert_array_equal(got2, expect)
    st.close()


@pytest.mark.parametrize("kind", BACKENDS)
def test_scopy_randomized(kind, tmp_path, rng):
    """Strided store-to-store copy (reference: FlashFileHandle::copy/scopy,
    flash_file_handle.cpp:409-427, 718-727): random src/dst stride specs of
    equal total bytes, contents verified end-to-end."""
    data = iota_file()
    src = make_store(kind, tmp_path, data)
    dst_dir = tmp_path / "dst"
    dst_dir.mkdir()
    dst = make_store(kind, dst_dir, np.zeros_like(data))
    for _ in range(20):
        n_runs = int(rng.integers(1, 8))
        run_el = int(rng.integers(1, 512))
        s_gap = run_el + int(rng.integers(0, 64))
        d_gap = run_el + int(rng.integers(0, 64))
        s_off = int(rng.integers(0, 1024)) * 4
        d_off = int(rng.integers(0, 1024)) * 4
        s_si = StrideInfo(stride=s_gap * 4, n_strides=n_runs,
                          len_per_stride=run_el * 4)
        d_si = StrideInfo(stride=d_gap * 4, n_strides=n_runs,
                          len_per_stride=run_el * 4)
        src.scopy(s_off, s_si, dst, d_off, d_si).wait()
        want = np.concatenate([
            data.view(np.uint8)[s_off + i * s_gap * 4:
                                s_off + i * s_gap * 4 + run_el * 4]
            for i in range(n_runs)])
        got = dst.read_sync(d_off, d_si)
        np.testing.assert_array_equal(got, want)
    src.close()
    dst.close()


@pytest.mark.parametrize("kind", ["mem", "py"])
def test_read_past_eof_zero_fills(kind, tmp_path):
    """All backends share the native engine's contract: reads past EOF
    zero-fill the remainder (full_pread, bof_io.cpp) rather than erroring."""
    data = np.arange(64, dtype=np.uint32)
    st = make_store(kind, tmp_path, data)
    out = st.read_sync(128, StrideInfo.contiguous(512))
    got = out.view(np.uint32)
    np.testing.assert_array_equal(got[:32], data[32:])
    np.testing.assert_array_equal(got[32:], 0)
    # strided read straddling EOF
    si = StrideInfo(stride=128, n_strides=4, len_per_stride=64)
    out2 = st.read_sync(64, si).view(np.uint32)
    np.testing.assert_array_equal(out2[:16], data[16:32])
    st.close()


@pytest.mark.parametrize("kind", ["native", "native_direct"])
def test_write_verify_catches_injected_corruption(kind, tmp_path, rng):
    """debug_checks parity: every write is read back and compared
    (reference: DEBUG builds, flash_file_handle.cpp:394-402).  Injected
    on-disk corruption must surface as an I/O error on the ticket."""
    import os as _os
    from bof_tpu.io.native import load_library
    lib = load_library()
    if lib is None:
        pytest.skip("native engine unavailable")
    data = iota_file(1 << 14)
    st = make_store(kind, tmp_path, data)
    lib.bof_set_verify_writes(1)
    try:
        vals = rng.integers(0, 2**32, 1024, dtype=np.uint32)
        # clean write passes verification
        st.write_sync(4096, StrideInfo.contiguous(4096),
                      vals.view(np.uint8).ravel())
        # corrupted write is caught
        _os.environ["BOF_TEST_CORRUPT_WRITES"] = "1"
        try:
            with pytest.raises(IOError):
                st.write_sync(8192, StrideInfo.contiguous(4096),
                              vals.view(np.uint8).ravel())
        finally:
            _os.environ.pop("BOF_TEST_CORRUPT_WRITES", None)
    finally:
        lib.bof_set_verify_writes(0)
    st.close()


def test_aio_depth_knob_plumbed(tmp_path, rng, monkeypatch):
    """FlashConfig.max_simul_reqs reaches the kernel-AIO submit loop: a
    depth-2 engine still completes a 64-run aligned strided op correctly.
    (Span coalescing off: this access is span-eligible since r3.)"""
    import ctypes
    from bof_tpu.io.native import NativeFileStore, alloc_aligned, load_library
    monkeypatch.setenv("BOF_NO_SPAN_COALESCE", "1")
    lib = load_library()
    if lib is None:
        pytest.skip("native engine unavailable")
    lib.bof_aio_ops.restype = ctypes.c_longlong
    n = 1 << 18
    data = np.arange(n, dtype=np.uint32)
    path = str(tmp_path / "depth.bin")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    lib.bof_set_aio_depth(2, 256)
    try:
        st = NativeFileStore(path, o_direct=True, n_threads=2)
        before = lib.bof_aio_ops()
        sinfo = StrideInfo(stride=8192, n_strides=64, len_per_stride=2048)
        out = alloc_aligned(sinfo.nbytes)
        st.read(0, sinfo, out).wait()
        assert lib.bof_aio_ops() > before
        want = np.concatenate([data[i * 2048: i * 2048 + 512]
                               for i in range(64)])
        np.testing.assert_array_equal(out.view(np.uint32), want)
        st.close()
    finally:
        lib.bof_set_aio_depth(64, 256)


def test_zero_length_strided_submit(tmp_path):
    """Zero-length / zero-run accesses complete immediately — regression:
    the native grouping math divided by len_per_stride before the guard
    (SIGFPE killed the process)."""
    from bof_tpu.io.native import NativeFileStore, load_library
    if load_library() is None:
        pytest.skip("native engine unavailable")
    data = iota_file(1 << 12)
    st = make_store("native", tmp_path, data)
    for n_runs, ln in ((2, 0), (0, 64), (0, 0)):
        si = StrideInfo(stride=512, n_strides=n_runs, len_per_stride=ln)
        out = np.zeros(max(1, si.nbytes), np.uint8)
        st.read(0, si, out[:si.nbytes] if si.nbytes else out[:0]).wait()
        st.write(0, si, out[:si.nbytes] if si.nbytes else out[:0]).wait()
    st.close()


def test_native_pin_oversized_raises(tmp_path):
    """Backend parity: the native pin cache rejects tiles larger than the
    budget with MemoryError (the Python cache's semantics), instead of
    evicting everything and overcommitting."""
    from bof_tpu.io.native import NativeFileStore, load_library
    from bof_tpu.io.native_cache import NativeTileCache
    if load_library() is None:
        pytest.skip("native engine unavailable")
    data = iota_file(1 << 14)
    st = make_store("native", tmp_path, data)
    nc = NativeTileCache(4096)
    try:
        with pytest.raises(MemoryError):
            nc.pin_read(st, 0, StrideInfo.contiguous(1 << 14))
    finally:
        nc.close()
        st.close()


def test_pystore_zero_length_ticket_completes(tmp_path):
    """Zero-byte accesses must return completed tickets (regression: a
    0-op _TicketState never fired op_done and waiters hung forever)."""
    data = np.arange(64, dtype=np.uint32)
    st = make_store("py", tmp_path, data)
    t = st.read(0, StrideInfo.contiguous(0), np.zeros(0, np.uint8))
    assert t.done()
    t.wait()
    t2 = st.write(0, StrideInfo(stride=64, n_strides=0, len_per_stride=0),
                  np.zeros(0, np.uint8))
    assert t2.done()
    st.close()


def test_non_contiguous_buffer_rejected(tmp_path):
    """The native engine DMAs a contiguous span through ctypes.data —
    strided/reversed views must be rejected up front on every backend."""
    import pytest

    from bof_tpu.io.store import MemStore
    from bof_tpu.io.stride import StrideInfo
    st = MemStore(4096)
    base = np.zeros(1024, np.uint8)
    for bad in (base[::2], base[::-1]):
        with pytest.raises(ValueError, match="contiguous"):
            st.read(0, StrideInfo.contiguous(256), bad)
        with pytest.raises(ValueError, match="contiguous"):
            st.write(0, StrideInfo.contiguous(256), bad)
