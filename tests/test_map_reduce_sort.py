"""map / reduce / external sample sort differential tests.

Golden models are plain numpy on the full array (the reference compares
against in-memory twins: in_mem_sort driver, map/reduce planner results).
"""
import numpy as np
import pytest

from bof_tpu import map_array, mem_array
from bof_tpu.ops import bof_map, bof_reduce, bof_sort


def test_map_sqrt(ctx, rng):
    n = 10_000
    data = np.abs(rng.standard_normal(n)).astype(np.float32)
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    import jax.numpy as jnp
    bof_map(src, dst, lambda x: jnp.sqrt(x), blk_elems=1024, ctx=ctx)
    np.testing.assert_allclose(dst.read_all(), np.sqrt(data), rtol=1e-6)


def test_map_jit_cache_handles_every_callable_kind(ctx, rng):
    """Every callable kind memoizes (or degrades) correctly: plain fns
    via the weakref cache; numpy ufuncs resolve to their jnp namesake
    (np.sqrt calls __array__ on tracers AND can't be weakref'd);
    non-weakrefable builtins (abs) take the strong LRU; unhashable fns
    degrade to per-call jit.  Losing memoization means a full retrace
    per bof_map call (~30s remote compiles)."""
    from bof_tpu.ops.map_reduce import _jit_elementwise

    # ufunc: resolves to jnp.sqrt, same compiled wrapper on every lookup
    assert _jit_elementwise(np.sqrt) is _jit_elementwise(np.sqrt)
    # unknown ufunc name raises clearly, not deep in a trace
    import pytest as _pytest
    with _pytest.raises(TypeError, match="jax.numpy equivalent"):
        _jit_elementwise(np.isnat)  # datetime ufunc: no jnp namesake
    # plain function: weakref path, also memoized
    f = lambda x: x + 1  # noqa: E731
    assert _jit_elementwise(f) is _jit_elementwise(f)
    # builtin (non-weakrefable, hashable): strong LRU, memoized
    assert _jit_elementwise(abs) is _jit_elementwise(abs)

    n = 4_000
    data = np.abs(rng.standard_normal(n)).astype(np.float32) - 0.5
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    bof_map(src, dst, np.abs, blk_elems=512, ctx=ctx)  # ufunc end-to-end
    np.testing.assert_allclose(dst.read_all(), np.abs(data), rtol=1e-6)
    bof_map(src, dst, abs, blk_elems=512, ctx=ctx)  # builtin end-to-end
    np.testing.assert_allclose(dst.read_all(), np.abs(data), rtol=1e-6)

    class UnhashableFn:
        __hash__ = None

        def __call__(self, x):
            return x * 2.0
    bof_map(src, dst, UnhashableFn(), blk_elems=512, ctx=ctx)
    np.testing.assert_allclose(dst.read_all(), data * 2.0, rtol=1e-6)


def test_map_in_place(ctx, rng):
    n = 5000
    data = rng.standard_normal(n).astype(np.float32)
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    bof_map(src, src, lambda x: x * 2.0 + 1.0, blk_elems=999, ctx=ctx)
    np.testing.assert_allclose(src.read_all(), data * 2.0 + 1.0, rtol=1e-6)


def test_reduce_sum_max_min(ctx, rng):
    n = 33_333
    data = rng.standard_normal(n).astype(np.float32)
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    s = bof_reduce(src, "sum", blk_elems=4096, ctx=ctx)
    np.testing.assert_allclose(s, data.astype(np.float64).sum(), rtol=1e-10)
    assert bof_reduce(src, "max", blk_elems=4096, ctx=ctx) == data.max()
    assert bof_reduce(src, "min", blk_elems=4096, ctx=ctx) == data.min()


def test_map_then_reduce_driver_composition(ctx, rng):
    """The reference's map_reduce driver: map=sqrt then reduce=sum
    (reference: drivers/map_reduce.cpp)."""
    n = 20_000
    data = np.abs(rng.standard_normal(n)).astype(np.float32) + 1.0
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    import jax.numpy as jnp
    bof_map(src, dst, jnp.sqrt, blk_elems=3000, ctx=ctx)
    got = bof_reduce(dst, "sum", blk_elems=3000, ctx=ctx)
    want = np.sqrt(data.astype(np.float64)).sum()
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("dtype", [np.float32, np.int64, np.uint32])
def test_sort_dtypes(ctx, rng, dtype, tmp_path):
    n = 50_000
    if np.issubdtype(dtype, np.floating):
        data = rng.standard_normal(n).astype(dtype)
    else:
        data = rng.integers(0, 1 << 30, n).astype(dtype)
    src = map_array(str(tmp_path / "s.bin"), (n,), dtype, create=True,
                    ctx=ctx)
    src.write_all(data)
    dst = map_array(str(tmp_path / "d.bin"), (n,), dtype, create=True,
                    ctx=ctx)
    bof_sort(src, dst, blk_elems=4096, ctx=ctx)
    np.testing.assert_array_equal(dst.read_all(), np.sort(data))


def test_sort_descending(ctx, rng):
    n = 30_000
    data = rng.standard_normal(n).astype(np.float32)
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    bof_sort(src, dst, descending=True, blk_elems=4096, ctx=ctx)
    np.testing.assert_array_equal(dst.read_all(), np.sort(data)[::-1])


def test_sort_single_block(ctx, rng):
    data = rng.standard_normal(100).astype(np.float32)
    src = mem_array((100,), np.float32, data=data, ctx=ctx)
    dst = mem_array((100,), np.float32, ctx=ctx)
    bof_sort(src, dst, blk_elems=4096, ctx=ctx)
    np.testing.assert_array_equal(dst.read_all(), np.sort(data))


def test_sort_with_duplicates(ctx, rng):
    n = 40_000
    data = rng.integers(0, 50, n).astype(np.int64)  # heavy duplication
    src = mem_array((n,), np.int64, data=data, ctx=ctx)
    dst = mem_array((n,), np.int64, ctx=ctx)
    bof_sort(src, dst, blk_elems=3000, ctx=ctx)
    np.testing.assert_array_equal(dst.read_all(), np.sort(data))


def test_sort_custom_key(ctx, rng):
    """Comparator analog: sort by |x| via a key function."""
    n = 25_000
    data = rng.standard_normal(n).astype(np.float32)
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    bof_sort(src, dst, key=np.abs, blk_elems=3000, ctx=ctx)
    got = dst.read_all()
    np.testing.assert_array_equal(np.abs(got), np.sort(np.abs(data)))


def test_sort_device_compute(ctx, rng):
    """sort_compute='device' runs block sorts on the accelerator."""
    ctx.config.sort_compute = "device"
    n = 20_000
    data = rng.standard_normal(n).astype(np.float32)
    src = mem_array((n,), np.float32, data=data, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    bof_sort(src, dst, blk_elems=4096, ctx=ctx)
    np.testing.assert_array_equal(dst.read_all(), np.sort(data))


def test_sort_empty_input(ctx):
    from bof_tpu import flash_empty
    from bof_tpu.ops.sort import bof_sort
    src = flash_empty((0,), np.float32, ctx=ctx)
    dst = flash_empty((0,), np.float32, ctx=ctx)
    bof_sort(src, dst, ctx=ctx)  # must be a no-op, not a crash


def test_map_float64_exact_without_x64(ctx, rng):
    """fp64 map on a backend without native 64-bit support (x64 off in
    the suite) must stay EXACT: bof_map applies the fn to the numpy block
    directly instead of silently narrowing through the device."""
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 on: the jitted path is already exact")
    n = 4097
    data = np.abs(rng.standard_normal(n)) + 1e-9
    src = mem_array((n,), np.float64, data=data, ctx=ctx)
    dst = mem_array((n,), np.float64, ctx=ctx)
    bof_map(src, dst, np.sqrt, blk_elems=1000, ctx=ctx)
    np.testing.assert_array_equal(dst.read_all(), np.sqrt(data))


def test_map_float64_jnp_fn_raises(ctx, rng):
    """A jnp-based fn would come back float32 on an x64-off backend; the
    dtype check must raise a diagnosable error, never store narrowed
    values into a float64 destination."""
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 on: narrowing cannot occur")
    import jax.numpy as jnp
    n = 64
    src = mem_array((n,), np.float64,
                    data=rng.standard_normal(n), ctx=ctx)
    dst = mem_array((n,), np.float64, ctx=ctx)
    with pytest.raises(RuntimeError) as ei:  # scheduler wraps task errors
        bof_map(src, dst, lambda x: jnp.asarray(x) * 2.0,
                blk_elems=32, ctx=ctx)
    assert "float32" in str(ei.value.__cause__)


def test_sort_float64_device_mode_falls_back(ctx, rng):
    """sort_compute='device' with fp64 elements on an x64-off backend:
    a device round-trip would write narrowed values back to disk, so the
    sorter must fall back to the host path and stay bit-exact."""
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 on: device sort is exact")
    old = getattr(ctx.config, "sort_compute", "host")
    ctx.config.sort_compute = "device"
    try:
        n = 20_000
        # values whose f32 round-trip is lossy (guards against a silent
        # narrowing producing a "close enough" sort)
        data = rng.standard_normal(n) * (1.0 + 1e-12)
        src = mem_array((n,), np.float64, data=data.copy(), ctx=ctx)
        dst = mem_array((n,), np.float64, ctx=ctx)
        from bof_tpu.ops import bof_sort
        bof_sort(src, dst, blk_elems=3000, ctx=ctx)
        np.testing.assert_array_equal(dst.read_all(), np.sort(data))
    finally:
        ctx.config.sort_compute = old


def test_sort_device_mode_preserves_nans(ctx, rng):
    """Device block sort with NaN elements: the pow2 padding must not
    swallow NaNs (with +inf padding jnp.sort ordered real NaNs after the
    pad infs and the [:m] slice DROPPED them, writing pad infs back to
    disk in place).  NaN padding keeps exactly the real NaNs, matching
    the host np.sort bit-for-bit."""
    old = getattr(ctx.config, "sort_compute", "host")
    ctx.config.sort_compute = "device"
    try:
        n = 10_000
        data = rng.standard_normal(n).astype(np.float32)
        nan_at = rng.choice(n, 37, replace=False)
        data[nan_at] = np.nan
        src = mem_array((n,), np.float32, data=data.copy(), ctx=ctx)
        dst = mem_array((n,), np.float32, ctx=ctx)
        from bof_tpu.ops import bof_sort
        bof_sort(src, dst, blk_elems=3000, ctx=ctx)
        got = dst.read_all()
        want = np.sort(data)  # numpy: NaNs last
        np.testing.assert_array_equal(got[:n - 37], want[:n - 37])
        assert np.isnan(got[n - 37:]).all()
    finally:
        ctx.config.sort_compute = old


def test_sort_rejects_overlapping_output(ctx, rng):
    """Phase 3 reads source fragments while writing dst: an aliased or
    overlapping output would consume half-written buckets silently."""
    from bof_tpu import mem_array
    from bof_tpu.ops.sort import bof_sort
    x = rng.standard_normal(256).astype(np.float32)
    src = mem_array((256,), np.float32, data=x, ctx=ctx)
    with pytest.raises(ValueError, match="overlap"):
        bof_sort(src, src, blk_elems=64, ctx=ctx)
    # a same-store but disjoint view is legal
    from bof_tpu.core.flash_array import FlashArray
    big = mem_array((512,), np.float32, ctx=ctx)
    s2 = FlashArray(big.store, (256,), np.float32, "R", offset=0, ctx=ctx)
    d2 = FlashArray(big.store, (256,), np.float32, "R", offset=1024,
                    ctx=ctx)
    s2.write_all(x)
    bof_sort(s2, d2, blk_elems=64, ctx=ctx)
    np.testing.assert_array_equal(d2.read_all(), np.sort(x))


def test_sort_rejects_same_file_opened_twice(ctx, tmp_path, rng):
    """store_uid differs across two open_store calls on one path, so the
    overlap guard must use inode identity (same_backing), not uids."""
    x = rng.standard_normal(256).astype(np.float32)
    p = str(tmp_path / "alias.bin")
    src = map_array(p, (256,), np.float32, create=True, ctx=ctx)
    src.write_all(x)
    dst = map_array(p, (256,), np.float32, ctx=ctx)  # same file, new store
    with pytest.raises(ValueError, match="overlap"):
        bof_sort(src, dst, blk_elems=64, ctx=ctx)


def test_map_rejects_partial_overlap_allows_exact_inplace(ctx, rng):
    from bof_tpu.core.flash_array import FlashArray
    x = rng.standard_normal(256).astype(np.float32)
    big = mem_array((512,), np.float32, ctx=ctx)
    s = FlashArray(big.store, (256,), np.float32, "R", offset=0, ctx=ctx)
    d_part = FlashArray(big.store, (256,), np.float32, "R", offset=512,
                        ctx=ctx)  # half-overlapping
    s.write_all(x)
    with pytest.raises(ValueError, match="alias|overlap"):
        bof_map(s, d_part, lambda v: v * 2.0, blk_elems=64, ctx=ctx)
    # exact in-place through the same store is supported
    bof_map(s, s, lambda v: v * 2.0, blk_elems=64, ctx=ctx)
    np.testing.assert_allclose(s.read_all(), x * 2.0, rtol=1e-6)


def test_map_tail_block_is_shape_bucketed(ctx, rng):
    """A non-multiple length must not mint a tail-shaped device compile:
    the tail pads to the full block shape and slices the result."""
    n, blk = 300, 128  # tail of 44
    x = rng.standard_normal(n).astype(np.float32)
    src = mem_array((n,), np.float32, data=x, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    bof_map(src, dst, lambda v: v + 1.0, blk_elems=blk, ctx=ctx)
    np.testing.assert_allclose(dst.read_all(), x + 1.0, rtol=1e-6)


def test_map_rejects_silent_dtype_cast(ctx, rng):
    import jax.numpy as jnp
    x = rng.standard_normal(64).astype(np.float32)
    src = mem_array((64,), np.float32, data=x, ctx=ctx)
    dst = mem_array((64,), np.int32, ctx=ctx)
    with pytest.raises(RuntimeError) as ei:
        bof_map(src, dst, lambda v: v * 2.0, blk_elems=32, ctx=ctx)
    assert "returned float32" in str(ei.value.__cause__)


def test_reduce_int64_sum_exact_past_2_53(ctx):
    """Integer sums fold in their own 64-bit family: float64 accumulation
    would round away the +1s next to 2^62."""
    vals = np.array([2 ** 62, 1, 1, 1, -(2 ** 62)] + [1] * 11, np.int64)
    src = mem_array((len(vals),), np.int64, data=vals, ctx=ctx)
    got = bof_reduce(src, "sum", blk_elems=4, ctx=ctx)
    assert got == vals.sum()
    assert np.asarray(got).dtype == np.int64
    # uint64 stays in uint64
    uv = np.array([2 ** 63, 1, 2, 3], np.uint64)
    usrc = mem_array((4,), np.uint64, data=uv, ctx=ctx)
    ugot = bof_reduce(usrc, "sum", blk_elems=2, ctx=ctx)
    assert ugot == uv.sum() and np.asarray(ugot).dtype == np.uint64


def test_sort_bool_device_path(ctx, rng):
    """bool + device sort + non-power-of-two block: _pad_fill must not
    call np.iinfo on bool."""
    old = ctx.config.sort_compute
    ctx.config.sort_compute = "device"
    try:
        x = (rng.random(300) > 0.5)
        src = mem_array((300,), np.bool_, data=x, ctx=ctx)
        dst = mem_array((300,), np.bool_, ctx=ctx)
        bof_sort(src, dst, blk_elems=100, ctx=ctx)
        np.testing.assert_array_equal(dst.read_all(), np.sort(x))
    finally:
        ctx.config.sort_compute = old


def test_sort_duplicate_heavy_raises_clearly(tmp_path, rng):
    """All-equal keys collapse into one bucket; when that bucket exceeds
    the program budget the failure must be an up-front ValueError, not a
    scheduler MemoryError mid-DAG."""
    from bof_tpu import FlashConfig, FlashContext
    small = FlashContext(FlashConfig(scratch_dir=str(tmp_path / "s"),
                                     program_budget=8 << 20,
                                     n_io_threads=2, n_compute_threads=1))
    try:
        n = 2_000_000  # phase-1 blocks (~180 KB) fit the 8 MiB budget,
        # but the single all-equal bucket (8 MB x2) does not
        src = mem_array((n,), np.float32,
                        data=np.full(n, 7.0, np.float32), ctx=small)
        dst = mem_array((n,), np.float32, ctx=small)
        with pytest.raises(ValueError, match="duplicate-heavy"):
            bof_sort(src, dst, blk_elems=1 << 18, ctx=small)
    finally:
        small.destroy()
