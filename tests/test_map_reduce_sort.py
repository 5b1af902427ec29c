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
