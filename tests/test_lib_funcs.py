"""lib funcs (memset/memcpy/truncate), types, and debug validators."""
import numpy as np
import pytest

from bof_tpu import flash_empty, flash_free, mem_array
from bof_tpu.lib_funcs import flash_memcpy, flash_memset, flash_truncate
from bof_tpu.sparse.csr import verify_csr_block
from bof_tpu.types import check_fp_dtype


def test_flash_memset(ctx):
    arr = flash_empty((10_000,), np.float32, ctx=ctx)
    flash_memset(arr, 0)
    np.testing.assert_array_equal(arr.read_all(), 0.0)
    flash_free(arr)


def test_flash_memcpy(ctx, rng):
    data = rng.standard_normal(5000).astype(np.float32)
    src = mem_array((5000,), np.float32, data=data, ctx=ctx)
    dst = flash_empty((5000,), np.float32, ctx=ctx)
    flash_memcpy(dst, src)
    np.testing.assert_array_equal(dst.read_all(), data)
    flash_free(dst)


def test_flash_truncate(ctx):
    arr = flash_empty((1000,), np.int32, ctx=ctx)
    arr.write_all(np.arange(1000, dtype=np.int32))
    small = flash_truncate(arr, 100)
    assert small.shape == (100,)
    np.testing.assert_array_equal(small.read_all(),
                                  np.arange(100, dtype=np.int32))
    flash_free(arr)


def test_check_fp_dtype():
    assert check_fp_dtype(np.float32) == np.dtype(np.float32)
    with pytest.raises(TypeError):
        check_fp_dtype(np.int32)


def test_verify_csr_block():
    ia = np.array([0, 2, 5], np.int64)
    ja = np.array([1, 3, 0, 2, 4], np.int64)
    verify_csr_block(ia, ja, 5)  # ok
    with pytest.raises(ValueError):
        verify_csr_block(ia, ja, 4)  # col out of range
    with pytest.raises(ValueError):
        verify_csr_block(np.array([0, 3, 1], np.int64), ja[:1], 5)
    with pytest.raises(ValueError):
        verify_csr_block(ia, ja[:4], 5)  # nnz mismatch


def test_csrmm_with_debug_checks(ctx, rng):
    import scipy.sparse as sps
    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    ctx.config.debug_checks = True
    ctx.config.max_nnzs = 512
    a_sp = sps.random(100, 80, density=0.05, format="csr",
                      dtype=np.float32, random_state=np.random.RandomState(1))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b = rng.standard_normal((80, 8)).astype(np.float32)
    B = mem_array((80, 8), np.float32, data=b, ctx=ctx)
    C = mem_array((100, 8), np.float32, ctx=ctx)
    csrmm(A, B, C, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), a_sp @ b, rtol=1e-4, atol=1e-4)


def test_gemm_float64_requires_x64(ctx, rng):
    """Without x64 mode, fp64 operands raise a clear error instead of
    silently downcasting (and previously deadlocking)."""
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 already enabled")
    from bof_tpu.ops import gemm
    A = mem_array((8, 8), np.float64, ctx=ctx)
    B = mem_array((8, 8), np.float64, ctx=ctx)
    C = mem_array((8, 8), np.float64, ctx=ctx)
    with pytest.raises(ValueError, match="x64"):
        gemm(A, B, C, blk=16, ctx=ctx)


def test_gemm_float64_subprocess(tmp_path):
    """fp64 end-to-end (reference FP_DOUBLE_PRECISION analog) in a child
    process with JAX_ENABLE_X64=1 on the CPU backend."""
    import os
    import subprocess
    import sys
    code = """
import numpy as np
import bof_tpu as bt
from bof_tpu.ops import gemm
rng = np.random.default_rng(0)
ctx = bt.FlashContext(bt.FlashConfig(scratch_dir=%r))
m, n, k = 40, 30, 50
a = rng.standard_normal((m, k)); b = rng.standard_normal((k, n))
A = bt.mem_array((m, k), np.float64, data=a, ctx=ctx)
B = bt.mem_array((k, n), np.float64, data=b, ctx=ctx)
C = bt.mem_array((m, n), np.float64, ctx=ctx)
gemm(A, B, C, blk=16, ctx=ctx)
np.testing.assert_allclose(C.read_all(), a @ b, rtol=1e-12)
print("F64 OK")
""" % str(tmp_path / "scratch")
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0 and "F64 OK" in r.stdout, r.stderr[-2000:]


def test_flash_memset_padded_submatrix(ctx):
    """ld-padded sub-matrix memset must not touch the parent's bytes
    outside the view (regression: the old path treated the view as
    contiguous bytes and corrupted neighbors)."""
    from bof_tpu import FlashArray, mem_array
    parent = mem_array((16, 32), np.float32, ctx=ctx,
                       data=np.arange(16 * 32, dtype=np.float32)
                       .reshape(16, 32))
    it = np.dtype(np.float32).itemsize
    sub = FlashArray(parent.store, (8, 16), np.float32, "R",
                     offset=(4 * 32 + 8) * it, ld=32, ctx=ctx)
    flash_memset(sub, 0)
    got = parent.read_all()
    want = np.arange(16 * 32, dtype=np.float32).reshape(16, 32)
    want[4:12, 8:24] = 0.0
    np.testing.assert_array_equal(got, want)


def test_flash_memcpy_padded_and_mixed_order(ctx, rng):
    """Padded and layout-changing copies stream through strided scopy /
    host transposition (reference: scopy, flash_file_handle.cpp:718-727)."""
    from bof_tpu import FlashArray, mem_array
    it = np.dtype(np.float32).itemsize
    src_parent = mem_array((12, 20), np.float32, ctx=ctx,
                           data=rng.standard_normal((12, 20))
                           .astype(np.float32))
    dst_parent = mem_array((10, 24), np.float32, ctx=ctx,
                           data=np.zeros((10, 24), np.float32))
    src = FlashArray(src_parent.store, (6, 10), np.float32, "R",
                     offset=(2 * 20 + 3) * it, ld=20, ctx=ctx)
    dst = FlashArray(dst_parent.store, (6, 10), np.float32, "R",
                     offset=(1 * 24 + 5) * it, ld=24, ctx=ctx)
    flash_memcpy(dst, src)
    np.testing.assert_array_equal(dst.read_all(), src.read_all())
    # parent bytes outside the view untouched
    dp = dst_parent.read_all()
    assert np.count_nonzero(dp) == np.count_nonzero(src.read_all())
    # mixed order: R-major padded view -> C-major dense array
    cdst = mem_array((6, 10), np.float32, order="C",
                     data=np.zeros((6, 10), np.float32), ctx=ctx)
    flash_memcpy(cdst, src)
    np.testing.assert_array_equal(cdst.read_all(), src.read_all())


def test_flash_memcpy_dense_mixed_order(ctx, rng):
    """Equal-shape dense arrays with different storage orders must copy
    LOGICALLY (a raw byte copy would land transposed); transposed-shape
    pairs keep the byte-reinterpret semantics."""
    from bof_tpu import mem_array
    a = rng.standard_normal((6, 10)).astype(np.float32)
    src = mem_array((6, 10), np.float32, order="R", data=a, ctx=ctx)
    dst = mem_array((6, 10), np.float32, order="C",
                    data=np.zeros((6, 10), np.float32), ctx=ctx)
    flash_memcpy(dst, src)
    np.testing.assert_array_equal(dst.read_all(), a)
    # transpose-shape reinterpret: R(6,10) -> C(10,6) shares byte layout,
    # so the raw copy yields the transpose as a (10,6) logical matrix
    dst2 = mem_array((10, 6), np.float32, order="C",
                     data=np.zeros((10, 6), np.float32), ctx=ctx)
    flash_memcpy(dst2, src)
    np.testing.assert_array_equal(dst2.read_all(), a.T)


def test_flash_memcpy_square_mixed_order_is_logical(ctx, rng):
    """Square equal-shape mixed-order copies must be LOGICAL (square
    shapes are both equal and reversed-equal; the byte-reinterpret branch
    would silently transpose)."""
    from bof_tpu import mem_array
    a = rng.standard_normal((8, 8)).astype(np.float32)
    src = mem_array((8, 8), np.float32, order="R", data=a, ctx=ctx)
    dst = mem_array((8, 8), np.float32, order="C",
                    data=np.zeros((8, 8), np.float32), ctx=ctx)
    flash_memcpy(dst, src)
    np.testing.assert_array_equal(dst.read_all(), a)
