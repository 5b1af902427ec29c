"""Streamed elementwise map and reduction over flash-resident arrays.

Re-design of the reference's map/reduce (reference: include/map_reduce.tpp
+ include/tasks/map_reduce_task.h): fixed-size blocks become scheduler
tasks; MapTask applies a function to a source block and writes the
destination block (map_reduce_task.h:11-48), ReduceTask folds a block to a
partial result that the host combines (map_reduce_task.h:49-98).  Where the
reference applies a std::function per element on OpenMP threads, the
function here is a jitted JAX vector op dispatched on the accelerator by
the compute threads — blocks from different tasks pipeline through the
device queue.

The reference throttles map concurrency with a pairwise dependency chain
(map_reduce.tpp:26-43); here the scheduler's in-flight cap and cache budget
provide the same bound without serializing.
"""
from __future__ import annotations

import threading
import weakref
from typing import Callable, Optional

import numpy as np

from ..context import get_context
from ..core.flash_array import FlashArray
from ..core.task import FnTask
from ..utils import cdiv

# Weakref-keyed (not lru_cache): a dead fn releases its closure AND the
# compiled executable immediately instead of pinning up to 64 of them for
# process lifetime.  Hashable-but-non-weakrefable callables (builtins
# like `abs`: weakref.ref(abs) raises TypeError) get a small strong-ref
# LRU — such callables are process-global singletons, so pinning them
# leaks nothing, and losing memoization would retrace (a ~30s remote
# compile here) on EVERY bof_map call.  numpy ufuncs are resolved to
# their jax.numpy namesake before caching (see _jit_elementwise).
# Unhashable callables degrade to a per-call jit.
_jit_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_jit_strong_cache: "dict" = {}  # insertion-ordered: oldest evicted first
_JIT_STRONG_CAP = 64
_jit_lock = threading.Lock()


def _jit_elementwise(fn):
    # memoized per fn object: callers that map the same fn repeatedly
    # (warm-up + measured run, or an iterative solver) reuse one jit
    # wrapper instead of retracing per bof_map call
    import jax
    if isinstance(fn, np.ufunc):
        # numpy ufuncs call __array__ on tracers (untraceable under jit)
        # and cannot be weakref'd; the jax.numpy function of the same
        # name is both traceable and a cacheable module singleton
        import jax.numpy as jnp
        jfn = getattr(jnp, fn.__name__, None)
        if jfn is None:
            raise TypeError(
                f"bof_map fn {fn!r} has no jax.numpy equivalent "
                f"(jnp.{fn.__name__} does not exist); pass a jnp-based "
                "callable instead")
        fn = jfn
    with _jit_lock:
        try:
            ref = weakref.ref(fn)
        except TypeError:
            ref = None
        # non-weakref-path jits go through a strong trampoline lambda:
        # jax.jit itself weakrefs its fun (its internal cache), so
        # jit(np.sqrt) raises the very TypeError being handled here
        if ref is not None:
            try:
                hit = _jit_cache.get(fn)
            except TypeError:  # unhashable: fresh jit per call
                return jax.jit(lambda x, _fn=fn: _fn(x))
            if hit is None:
                # jit a trampoline that holds fn only WEAKLY: caching
                # jax.jit(fn) directly would make the value reference
                # its own key, which defeats WeakKeyDictionary
                # collection (the documented value->key caveat) and pins
                # fn's closure + executable for process lifetime.  The
                # caller holds fn for the duration of the bof_map call,
                # so the deref cannot fail mid-trace.
                hit = jax.jit(lambda x: ref()(x))
                _jit_cache[fn] = hit
            return hit
        try:
            hit = _jit_strong_cache.pop(fn, None)
        except TypeError:  # unhashable: fresh jit per call
            return jax.jit(lambda x, _fn=fn: _fn(x))
        if hit is None:
            hit = jax.jit(lambda x, _fn=fn: _fn(x))
            if len(_jit_strong_cache) >= _JIT_STRONG_CAP:
                _jit_strong_cache.pop(next(iter(_jit_strong_cache)))
        _jit_strong_cache[fn] = hit  # (re-)insert at LRU tail
        return hit


def bof_map(src: FlashArray, dst: FlashArray, fn: Callable,
            blk_elems: Optional[int] = None, ctx=None) -> None:
    """dst[i] = fn(src[i]) streamed in blocks (reference: flash::map,
    map_reduce.tpp:12-53).  `fn` maps a 1-D jnp vector to a same-shape
    vector; it is jitted once and reused for every block.

    Standard jax.jit semantics apply: values `fn` captures by closure are
    BAKED IN at first trace, and the trace is cached per fn object — a
    caller that mutates captured state between bof_map calls on the same
    fn object gets the first trace's values.  Pass varying state through
    the data, or use a fresh fn object.  The cache is weakref-keyed, so a
    released fn frees its closure and compiled executable."""
    ctx = ctx or src.ctx or get_context()
    if src.shape != dst.shape or len(src.shape) != 1:
        raise ValueError("map needs equal-shape 1-D arrays")
    from ..io.store import same_backing, store_uid
    if (same_backing(src.store, dst.store)
            and src.offset < dst.offset + dst.nbytes
            and dst.offset < src.offset + src.nbytes
            and not (store_uid(src.store) == store_uid(dst.store)
                     and src.offset == dst.offset
                     and src.itemsize == dst.itemsize)):
        # partially-overlapping src/dst would corrupt: block i's write can
        # cover block i+1's source bytes.  Exact in-place through the SAME
        # store is safe (read+write share one cache key/buffer per block);
        # through two stores on one inode it is not (two incoherent cache
        # entries), so that is rejected too (same guard family as
        # bof_sort)
        raise ValueError("map src/dst may alias only exactly in place "
                         "through the same store object; partially "
                         "overlapping ranges (or one file opened twice) "
                         "are rejected")
    n = src.shape[0]
    blk = blk_elems or ctx.config.map_blk_elems
    from .device import dtype_native_on_device
    device_path = (dtype_native_on_device(src.dtype)
                   and dtype_native_on_device(dst.dtype))
    if device_path:
        jfn = _jit_elementwise(fn)
    else:
        # 64-bit blocks the device would silently narrow (x64 off / TPU
        # fp64): apply fn to the numpy block directly — numpy-ufunc fns
        # stay exact; a jnp-based fn would come back narrowed, which the
        # dtype check below turns into a diagnosable error instead of a
        # silent precision loss.  The apply fans out over host threads
        # (the reference MapTask's OpenMP elementwise apply,
        # map_reduce_task.h:11-48); fn must be value-wise.
        def jfn(x):
            from ..utils.hostpar import parallel_map_chunks
            out = parallel_map_chunks(fn, x)
            if out.dtype != dst.dtype:
                raise ValueError(
                    f"map fn returned {out.dtype} for a {dst.dtype} "
                    "destination on a backend without native 64-bit "
                    "support; use numpy ops in fn (it receives a numpy "
                    "block here) or enable JAX x64")
            return out
    sched = ctx.scheduler()

    tasks = []
    for b0 in range(0, n, blk):
        bn = min(blk, n - b0)
        soff, ssin = src.block_access(b0, bn)
        doff, dsin = dst.block_access(b0, bn)

        def run(task, bn=bn, soff=soff, ssin=ssin, doff=doff, dsin=dsin):
            x = task.buf(src.store, soff, ssin, src.dtype)
            if device_path and bn < blk:
                # bucket the tail to the full block shape: each distinct
                # device shape is a fresh ~30s remote compile (CLAUDE.md)
                xp = np.zeros(blk, src.dtype)
                xp[:bn] = x
                out = np.asarray(jfn(xp))[:bn]
            else:
                out = np.asarray(jfn(x))
            if out.dtype != dst.dtype:
                raise ValueError(
                    f"map fn returned {out.dtype} for a {dst.dtype} "
                    "destination; cast inside fn (silent buffer-assignment "
                    "casts hid truncation)")
            task.buf(dst.store, doff, dsin, dst.dtype)[:] = out
        t = FnTask(run)
        t.add_read(src.store, soff, ssin)
        t.add_write(dst.store, doff, dsin)
        tasks.append(t)
    sched.add_tasks(tasks)
    sched.wait_for(tasks)
    sched.flush_cache()


def _sum_block(x):
    """Exact within the accumulator type: integer inputs fold in their
    own 64-bit family (float64 would round int64 sums past 2^53 — the
    repo's 64-bit exactness invariant); floats fold in float64."""
    if x.dtype.kind == "u":
        return x.sum(dtype=np.uint64)
    if x.dtype.kind in "ib":
        return x.sum(dtype=np.int64)
    return x.sum(dtype=np.float64)


_REDUCERS = {
    "sum": (_sum_block, lambda a, b: a + b, None),  # typed zero at fold
    "max": (lambda x: x.max(), max, -np.inf),
    "min": (lambda x: x.min(), min, np.inf),
}


def bof_reduce(src: FlashArray, op: str = "sum",
               block_fn: Optional[Callable] = None,
               combine: Optional[Callable] = None,
               init=None, blk_elems: Optional[int] = None, ctx=None):
    """Fold a 1-D flash array to a scalar (reference: flash::reduce,
    map_reduce.tpp:55-89 — per-block ReduceTasks, host combines).  Either a
    named op ('sum'/'max'/'min') or custom (block_fn, combine, init)."""
    ctx = ctx or src.ctx or get_context()
    if len(src.shape) != 1:
        raise ValueError("reduce needs a 1-D array")
    if block_fn is None:
        block_fn, combine, init = _REDUCERS[op]
    n = src.shape[0]
    blk = blk_elems or ctx.config.map_blk_elems
    sched = ctx.scheduler()

    n_blocks = cdiv(n, blk)
    results = [None] * n_blocks
    lock = threading.Lock()
    tasks = []
    for bi, b0 in enumerate(range(0, n, blk)):
        bn = min(blk, n - b0)
        soff, ssin = src.block_access(b0, bn)

        def run(task, bi=bi, soff=soff, ssin=ssin):
            x = task.buf(src.store, soff, ssin, src.dtype)
            r = block_fn(x)
            with lock:  # (reference: omp critical combine, :84-88)
                results[bi] = r
        t = FnTask(run)
        t.add_read(src.store, soff, ssin)
        tasks.append(t)
    sched.add_tasks(tasks)
    sched.wait_for(tasks)
    acc = init
    for r in results:
        acc = r if acc is None else combine(acc, r)
    if acc is None:  # empty input with the typed-zero sentinel ('sum')
        acc = (np.uint64(0) if src.dtype.kind == "u"
               else np.int64(0) if src.dtype.kind in "ib" else 0.0)
    return acc
