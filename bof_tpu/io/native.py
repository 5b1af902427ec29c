"""ctypes bindings to the native I/O engine (bof_tpu/native/bof_io.cpp).

The shared library is built lazily with g++ on first use and cached next to
the source.  `NativeFileStore` implements the BaseStore interface on top of
it, giving O_DIRECT + multi-threaded strided I/O — the role the reference's
FlashFileHandle/IoExecutor pair plays (reference: flash_file_handle.cpp,
io_executor.cpp).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..config import SECTOR_LEN
from ..utils import LOG
from .store import BaseStore, Ticket, _check_access, store_uid
from .stride import StrideInfo

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "bof_io.cpp"))
_INC = os.path.abspath(os.path.join(_NATIVE_DIR, "bof_cache.inc"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libbof_io.so"))

_lib = None
_lib_lock = threading.Lock()
_engine_started = False
_span_disable_sent = None  # last value pushed to bof_set_span_disable


def _sync_span_flag(lib):
    """Mirror BOF_NO_SPAN_COALESCE into the engine's atomic.  Reading
    os.environ here is a GIL-safe dict lookup; the old design had worker
    threads calling getenv() per op, racing Python-side putenv (environ
    realloc — UB).  Called per submit: one dict get + compare, and the
    ctypes call only fires when the value actually changes (tests and
    paired A/Bs toggle it mid-process)."""
    global _span_disable_sent
    cur = 1 if os.environ.get("BOF_NO_SPAN_COALESCE") else 0
    if cur != _span_disable_sent and hasattr(lib, "bof_set_span_disable"):
        lib.bof_set_span_disable(cur)
        _span_disable_sent = cur


def _src_digest() -> str:
    """Content hash of the engine sources.  The shared fallback cache dir
    (~/.cache/bof_tpu) can be reached by several checkouts/venvs with
    different engine versions; mtime comparison across installs is
    meaningless there (wheel timestamps), so the cache file is keyed by
    what was actually compiled."""
    import hashlib
    h = hashlib.sha256()
    for p in (_SRC, _INC):
        if os.path.exists(p):
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def _so_target() -> str:
    """Where to build the engine: next to the sources when the package dir
    is writable (dev checkout), else under ~/.cache/bof_tpu (pip install
    into a read-only site-packages must not crash the self-build) with a
    source-hash-keyed name so different installed versions never collide."""
    if os.access(os.path.dirname(_SO), os.W_OK):
        return _SO
    fb_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "bof_tpu", "native")
    os.makedirs(fb_dir, exist_ok=True)
    return os.path.join(fb_dir, f"libbof_io-{_src_digest()}.so")


def _build() -> str:
    # build to a temp name and atomically publish: a concurrent process
    # must never dlopen a half-written ELF.  flock serializes concurrent
    # builders (parallel pytest workers, bench + tests).
    import fcntl
    so = _so_target()
    lock_path = so + ".lock"
    tmp = f"{so}.tmp.{os.getpid()}"
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            # another process may have finished the build while we waited
            src_mtime = max(os.path.getmtime(_SRC),
                            os.path.getmtime(_INC)
                            if os.path.exists(_INC) else 0.0)
            if (os.path.exists(so)
                    and os.path.getmtime(so) >= src_mtime):
                return so
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-pthread", _SRC, "-o", tmp]
            LOG.info("building native io engine: %s", " ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
            fcntl.flock(lk, fcntl.LOCK_UN)
    return so


def load_library():
    """Load (building if needed) the native engine; returns None on failure
    so callers can fall back to the Python backend."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            # staleness vs BOTH sources: bof_io.cpp #includes the pin
            # cache, so an .inc-only edit must also trigger a rebuild.
            # Prefer a fresh packaged .so; otherwise (re)build, possibly
            # into the user-writable fallback dir.
            src_mtime = max(os.path.getmtime(_SRC),
                            os.path.getmtime(_INC)
                            if os.path.exists(_INC) else 0.0)
            if (os.path.exists(_SO)
                    and os.path.getmtime(_SO) >= src_mtime):
                so = _SO
            else:
                so = _build()
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError) as e:
            LOG.warning("native io engine unavailable (%s); using python io", e)
            return None
        try:
            # core interface: a foreign/stale .so missing any of these
            # must degrade to the Python backend, not crash later with
            # an unbound symbol (and unbound argtypes would truncate
            # 64-bit pointers to C int defaults)
            lib.bof_engine_start.argtypes = [ctypes.c_int]
            lib.bof_engine_stop.argtypes = []
            lib.bof_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_longlong]
            lib.bof_open.restype = ctypes.c_longlong
            lib.bof_close.argtypes = [ctypes.c_longlong]
            lib.bof_file_size.argtypes = [ctypes.c_longlong]
            lib.bof_file_size.restype = ctypes.c_longlong
            lib.bof_truncate.argtypes = [ctypes.c_longlong,
                                         ctypes.c_longlong]
            lib.bof_fsync.argtypes = [ctypes.c_longlong]
            lib.bof_submit.argtypes = [ctypes.c_longlong] * 5 + [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_longlong]
            lib.bof_submit.restype = ctypes.c_longlong
            lib.bof_poll.argtypes = [ctypes.c_longlong]
            lib.bof_wait.argtypes = [ctypes.c_longlong]
            lib.bof_set_aio_depth.argtypes = [ctypes.c_int, ctypes.c_int]
            lib.bof_set_verify_writes.argtypes = [ctypes.c_int]
        except AttributeError as e:
            LOG.warning("native io engine .so is missing core symbols "
                        "(%s); using python io", e)
            return None
        # optional kernels, bound independently: a partially-matching .so
        # must not leave LATER symbols unbound-but-callable (ctypes'
        # default conversions truncate 64-bit pointers)
        for name, argtypes, restype in (
                ("bof_set_span_disable", [ctypes.c_int], None),
                ("bof_quantize_i8",
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong],
                 ctypes.c_double),
                ("bof_cast_bf16",
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong],
                 None),
                ("bof_split_f64_i8",
                 [ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
                  ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                  ctypes.c_void_p], None),
                ("bof_ell_fill",
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
                  ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
                  ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                  ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int], None),
                ("bof_merge_sorted_runs",
                 [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
                  ctypes.c_int], ctypes.c_int),
                ("bof_counting_argsort_i32",
                 [ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
                  ctypes.c_void_p], ctypes.c_int),
                ("bof_fold_i32_f64",
                 [ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
                  ctypes.c_longlong, ctypes.c_void_p, ctypes.c_void_p,
                  ctypes.c_longlong], None)):
            fn = getattr(lib, name, None)
            if fn is not None:
                fn.argtypes = argtypes
                if restype is not None:
                    fn.restype = restype
        _lib = lib
        return _lib


def quantize_i8(src: np.ndarray):
    """(int8 array, scale): per-tile max-abs quantization for the int8
    transfer mode.  Native engine when available — parallel fused passes,
    5.2x the numpy rint chain (327 -> 63 ms per 4096^2 tile, measured),
    which was the dominant stage (`prep_s`) of the compressed gemm path.
    The numpy fallback mirrors the native semantics (float32 scale math,
    round-half-even, +/-127 clamp, NaN-ignoring amax, empty -> scale 1);
    outputs agree except possibly the last ulp of f32 rounding at exact
    rounding ties."""
    src = np.ascontiguousarray(src, np.float32)
    lib = load_library()
    if lib is not None and hasattr(lib, "bof_quantize_i8"):
        dst = np.empty(src.shape, np.int8)
        scale = lib.bof_quantize_i8(src.ctypes.data, dst.ctypes.data,
                                    src.size)
        return dst, float(scale)
    # fmax ignores NaN (the native amax pass compares with >, skipping
    # NaN); initial=0 handles the empty tile like the native n=0 path
    amax = np.float32(np.fmax.reduce(np.abs(src), axis=None, initial=0.0))
    if amax == 0.0:
        amax = np.float32(1.0)
    scale = amax / np.float32(127.0)
    inv = np.float32(1.0) / scale
    q = np.clip(np.rint(src * inv), -127, 127)
    return q.astype(np.int8), float(scale)


def split_f64_i8(src: np.ndarray, exps: np.ndarray, per_line: bool,
                 s: int):
    """s int8 mantissa slices of a row-major 2-D float64 tile (the sliced
    fp64 gemm's host prep, ops/gemm64.py): one fused parallel pass over
    the tile instead of the numpy chain's s round-and-subtract passes
    with full-size temporaries.  `exps` = frexp exponents of the scale
    vector (per line when per_line else per column); returns None when
    the engine is unavailable (caller falls back to numpy)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "bof_split_f64_i8"):
        return None
    src = np.ascontiguousarray(src, np.float64)
    e = np.ascontiguousarray(exps, np.int32)
    want = src.shape[0] if per_line else src.shape[1]
    if e.shape != (want,):
        # an axis/flag mismatch would be an out-of-bounds heap read in
        # the C++ kernel (it indexes exps[i/width] or exps[i%width])
        raise ValueError(
            f"split_f64_i8: exps length {e.shape} does not match the "
            f"{'line' if per_line else 'column'} count {want} of a "
            f"{src.shape} tile")
    out = np.empty((s,) + src.shape, np.int8)
    lib.bof_split_f64_i8(src.ctypes.data, src.shape[0], src.shape[1],
                         e.ctypes.data, int(bool(per_line)), s,
                         out.ctypes.data)
    return out


_SORT_KINDS = {
    np.dtype(np.float32): 0, np.dtype(np.float64): 1,
    np.dtype(np.int64): 2, np.dtype(np.uint64): 3,
    np.dtype(np.int32): 4, np.dtype(np.uint32): 5,
    np.dtype(np.int16): 6, np.dtype(np.uint16): 7,
    np.dtype(np.int8): 8, np.dtype(np.uint8): 9,
}


def merge_sorted_runs(x: np.ndarray, bounds: np.ndarray) -> bool:
    """In-place parallel merge of adjacent PRE-SORTED runs of a
    contiguous 1-D array — the native half of the parallel block sort
    (utils/hostpar.parallel_sort; the reference's __gnu_parallel::sort
    role, include/tasks/sort_task.h:8,37).  The runs come from numpy's
    SIMD np.sort on Python threads (measured ~20x faster per shard than
    scalar std::sort — an all-native sort would be a pessimization).
    Float NaNs order last, matching np.sort.  Returns False when the
    engine or dtype can't take it — caller falls back to np.sort."""
    lib = load_library()
    if (lib is None or not hasattr(lib, "bof_merge_sorted_runs")
            or not x.flags["C_CONTIGUOUS"] or x.ndim != 1):
        return False
    kind = _SORT_KINDS.get(x.dtype)
    if kind is None:
        return False
    b = np.ascontiguousarray(bounds, np.int64)
    if b.ndim != 1 or b.size < 2 or b[0] != 0 or b[-1] != x.size \
            or (np.diff(b) < 0).any():
        raise ValueError(f"bad run bounds {b} for {x.size} elements")
    return lib.bof_merge_sorted_runs(x.ctypes.data, b.ctypes.data,
                                     b.size - 1, kind) == 0


def counting_argsort_i32(keys: np.ndarray, k: int):
    """Stable argsort of int32 keys known to lie in [0, k) — the ordering
    pass of csrcsc's phase-2 ragged merge (reference: BlockMergeTask's
    OpenMP merge, csrcsc_task.h:101-169).  Parallel counting sort:
    O(n + k) work beats comparison argsort even single-threaded.  Returns
    the int64 permutation, or None (caller falls back to np.argsort)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "bof_counting_argsort_i32"):
        return None
    keys = np.ascontiguousarray(keys, np.int32)
    out = np.empty(keys.size, np.int64)
    rc = lib.bof_counting_argsort_i32(keys.ctypes.data, keys.size,
                                      int(k), out.ctypes.data)
    return out if rc == 0 else None


def fold_i32_f64(planes: np.ndarray, weights: np.ndarray,
                 acc: np.ndarray) -> bool:
    """acc += sum_p weights[p] * planes[p] in ONE fused parallel pass —
    the sliced fp64 gemm's plane fold (ops/gemm64.py flush).  numpy does
    s separate multiply-add sweeps, each re-reading acc and building a
    full-size f64 temporary.  Per element the fused loop applies the
    SAME fp64 operation sequence, so the result is bit-identical.
    `acc` may be a strided row view (multihost shard regions); `planes`
    must be a contiguous (s, lines, width) int32 stack.  Returns False
    when the engine is unavailable or layouts don't qualify (caller
    falls back to the numpy chain)."""
    lib = load_library()
    if (lib is None or not hasattr(lib, "bof_fold_i32_f64")
            or planes.dtype != np.int32 or acc.dtype != np.float64
            or planes.ndim != 3 or acc.ndim != 2
            or not planes.flags["C_CONTIGUOUS"]
            or planes.shape[1:] != acc.shape
            or acc.strides[1] != 8 or acc.strides[0] % 8):
        return False
    w = np.ascontiguousarray(weights, np.float64)
    if w.shape != (planes.shape[0],):
        raise ValueError(f"weights {w.shape} != plane count "
                         f"{planes.shape[0]}")
    lib.bof_fold_i32_f64(planes.ctypes.data, planes.shape[0],
                         acc.shape[0], acc.shape[1], w.ctypes.data,
                         acc.ctypes.data, acc.strides[0] // 8)
    return True


def ell_fill(starts: np.ndarray, counts: np.ndarray, ja_blk: np.ndarray,
             va_blk: np.ndarray, rows_pad: int, rmax: int,
             idx_dtype, val_dtype):
    """Native padded-ELL row gather (the sparse planners' host prep);
    returns (ja_ell, va_ell) or None when the engine or this dtype
    combination is unavailable (caller falls back to the numpy chain).
    Supported: ja int64 -> int32|uint16; va f32 -> f32|bf16, f64 -> f64.
    Bit-identical to the numpy path (bf16 rounding matches ml_dtypes)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "bof_ell_fill"):
        return None
    if ja_blk.dtype != np.int64 or not ja_blk.flags.c_contiguous \
            or not va_blk.flags.c_contiguous:
        return None
    idx_dtype = np.dtype(idx_dtype)
    if idx_dtype == np.int32:
        jk = 0
    elif idx_dtype == np.uint16:
        jk = 1
    else:
        return None
    import ml_dtypes
    vd = np.dtype(val_dtype if val_dtype is not None else va_blk.dtype)
    if va_blk.dtype == np.float32 and vd == np.float32:
        vk = 0
    elif va_blk.dtype == np.float32 and vd == ml_dtypes.bfloat16:
        vk = 1
    elif va_blk.dtype == np.float64 and vd == np.float64:
        vk = 2
    else:
        return None
    starts = np.ascontiguousarray(starts, np.int64)
    counts = np.ascontiguousarray(counts, np.int64)
    ja_ell = np.empty((rows_pad, rmax), idx_dtype)
    va_ell = np.empty((rows_pad, rmax), vd)
    lib.bof_ell_fill(starts.ctypes.data, counts.ctypes.data,
                     len(counts), rows_pad, rmax, len(ja_blk),
                     ja_blk.ctypes.data, ja_ell.ctypes.data, jk,
                     va_blk.ctypes.data, va_ell.ctypes.data, vk)
    return ja_ell, va_ell


def cast_bf16(src: np.ndarray) -> np.ndarray:
    """float32 -> bfloat16 (round-to-nearest-even) for the bf16 transfer
    mode; native parallel cast with ml_dtypes fallback."""
    import ml_dtypes
    src = np.ascontiguousarray(src, np.float32)
    lib = load_library()
    if lib is not None and hasattr(lib, "bof_cast_bf16"):
        dst = np.empty(src.shape, np.uint16)
        lib.bof_cast_bf16(src.ctypes.data, dst.ctypes.data, src.size)
        return dst.view(ml_dtypes.bfloat16)
    return src.astype(ml_dtypes.bfloat16)


def apply_engine_config(cfg):
    """Push runtime knobs into the process-wide engine: AIO queue depth
    (reference: MAX_SIMUL_REQS/MAX_EVENTS, CMakeLists.txt:38-91, used at
    flash_file_handle.cpp:78-102) and debug write read-back verification
    (flash_file_handle.cpp:394-402)."""
    lib = load_library()
    if lib is None:
        return
    simul = int(getattr(cfg, "max_simul_reqs", 64))
    if simul > 128:
        LOG.warning("max_simul_reqs=%d clamped to 128 (engine slot "
                    "ceiling; io_setup beyond fs.aio-max-nr would "
                    "silently disable kernel AIO)", simul)
        simul = 128
    lib.bof_set_aio_depth(max(1, simul), max(256, 2 * simul))
    lib.bof_set_verify_writes(1 if getattr(cfg, "debug_checks", False) else 0)


def ensure_engine(n_threads: int):
    global _engine_started
    lib = load_library()
    if lib is None:
        return None
    with _lib_lock:
        if not _engine_started:
            lib.bof_engine_start(n_threads)
            _engine_started = True
    return lib


def alloc_aligned(nbytes: int, alignment: int = SECTOR_LEN) -> np.ndarray:
    """Sector-aligned uint8 buffer (reference: alloc_aligned,
    src/utils.cpp:13-20) so O_DIRECT transfers take the zero-copy path."""
    raw = np.empty(nbytes + alignment, dtype=np.uint8)
    off = (-raw.ctypes.data) % alignment
    return raw[off:off + nbytes]


class NativeTicket(Ticket):
    __slots__ = ("_lib", "_tid", "_waiting")

    def __init__(self, lib, tid: int, buf):
        super().__init__(buf)
        self._lib = lib
        self._tid = tid
        self._waiting = False  # a thread is inside bof_wait

    def done(self) -> bool:
        """True once the access completed (with OR without error — call
        wait() to surface errors; poll never frees the ticket slot)."""
        with self._cv:
            if self._done:
                return True
            if self._waiting:
                # another thread is inside bof_wait, which FREES the
                # slot on return: polling now could read a recycled
                # ticket id — report not-done until _complete fires
                return False
        return self._lib.bof_poll(self._tid) != 0

    def wait(self):
        with self._cv:
            while self._waiting and not self._done:
                self._cv.wait()  # another thread owns the bof_wait call
            if self._done:
                if self._error:
                    raise IOError(self._error)
                return
            # exactly one thread may call bof_wait: it frees the ticket
            # slot, and slot ids are recycled — a second concurrent call
            # could block on (and free!) an unrelated ticket
            self._waiting = True
        rc = self._lib.bof_wait(self._tid)  # releases the GIL
        err = None if rc == 0 else f"native io error: errno {-rc}"
        self._complete(err)  # notifies any waiters parked above
        self._buf = None
        if err:
            raise IOError(err)


class NativeFileStore(BaseStore):
    def __init__(self, path: str, create: bool = False, truncate_to: int = 0,
                 o_direct: bool = False, n_threads: int = 8,
                 max_chunk_bytes: int = 32 << 20):
        lib = ensure_engine(n_threads)
        if lib is None:
            raise RuntimeError("native io engine unavailable")
        self._lib = lib
        fd = lib.bof_open(path.encode(), 1 if create else 0,
                          1 if o_direct else 0, truncate_to)
        if fd < 0:
            raise IOError(f"open({path}) failed: errno {-fd}")
        self._fd = fd
        self.uid = store_uid(self)
        self.path = path
        self.o_direct = o_direct
        self._max_chunk = max_chunk_bytes
        # serializes close() against flush/submit/size: a raw check-then-
        # act on self._fd would let a concurrently-closed (and OS-recycled)
        # fd reach the engine — CLAUDE.md: fds are recycled
        self._fd_lock = threading.Lock()

    def size(self) -> int:
        with self._fd_lock:
            if self._fd is None:
                raise IOError(f"store is closed: {self.path}")
            return self._lib.bof_file_size(self._fd)

    def file_identity(self):
        with self._fd_lock:
            if self._fd is None:
                return None
            st = os.fstat(self._fd)
            return (st.st_dev, st.st_ino)

    def truncate(self, nbytes: int):
        with self._fd_lock:
            if self._fd is None:
                raise IOError(f"store is closed: {self.path}")
            self._lib.bof_truncate(self._fd, nbytes)

    def _submit(self, offset: int, sinfo: StrideInfo, buf: np.ndarray,
                is_write: bool) -> Ticket:
        _check_access(sinfo, buf)
        _sync_span_flag(self._lib)
        with self._fd_lock:
            if self._fd is None:
                raise IOError(f"store is closed: {self.path}")
            tid = self._lib.bof_submit(
                self._fd, offset, sinfo.stride, sinfo.n_strides,
                sinfo.len_per_stride, buf.ctypes.data, 1 if is_write else 0,
                self._max_chunk)
        if tid < 0:
            raise IOError(f"submit failed: errno {-tid}")
        return NativeTicket(self._lib, tid, buf)

    def read(self, offset: int, sinfo: StrideInfo, out: np.ndarray) -> Ticket:
        return self._submit(offset, sinfo, out, is_write=False)

    def write(self, offset: int, sinfo: StrideInfo, src: np.ndarray) -> Ticket:
        return self._submit(offset, sinfo, src, is_write=True)

    def flush(self):
        with self._fd_lock:
            if self._fd is None:
                return  # freed/closed concurrently (e.g. another
                # pipeline's cache.flush saw this scratch store before
                # free_scratch purged it)
            self._lib.bof_fsync(self._fd)

    def close(self):
        with self._fd_lock:
            if self._fd is not None and self._fd >= 0:
                self._lib.bof_close(self._fd)
            self._fd = None
