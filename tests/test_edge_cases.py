"""Edge cases: degenerate shapes, empty operands, scalar params."""
import numpy as np
import pytest
import scipy.sparse as sps

from bof_tpu import mem_array
from bof_tpu.ops import bof_map, bof_reduce, bof_sort, gemm
from bof_tpu.sparse import CsrFlashMatrix, csrcsc_scratch, csrgemv, csrmm


def test_gemm_alpha_zero(ctx, rng):
    m = n = k = 24
    c_np = rng.standard_normal((m, n)).astype(np.float32)
    A = mem_array((m, k), np.float32,
                  data=rng.standard_normal((m, k)).astype(np.float32),
                  ctx=ctx)
    B = mem_array((k, n), np.float32,
                  data=rng.standard_normal((k, n)).astype(np.float32),
                  ctx=ctx)
    C = mem_array((m, n), np.float32, data=c_np, ctx=ctx)
    gemm(A, B, C, alpha=0.0, beta=1.0, blk=16, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), c_np, rtol=1e-6)


def test_gemm_single_element(ctx):
    A = mem_array((1, 1), np.float32, data=np.array([[3.0]]), ctx=ctx)
    B = mem_array((1, 1), np.float32, data=np.array([[4.0]]), ctx=ctx)
    C = mem_array((1, 1), np.float32, ctx=ctx)
    gemm(A, B, C, blk=16, ctx=ctx)
    assert C.read_all()[0, 0] == 12.0


def test_gemm_tall_skinny(ctx, rng):
    m, n, k = 300, 2, 5
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    A = mem_array((m, k), np.float32, data=a, ctx=ctx)
    B = mem_array((k, n), np.float32, data=b, ctx=ctx)
    C = mem_array((m, n), np.float32, ctx=ctx)
    gemm(A, B, C, blk=64, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), a @ b, rtol=2e-4, atol=1e-4)


def test_csrmm_empty_matrix(ctx, rng):
    m, k, n = 40, 30, 8
    a_sp = sps.csr_matrix((m, k), dtype=np.float32)  # zero nnz
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    B = mem_array((k, n), np.float32,
                  data=rng.standard_normal((k, n)).astype(np.float32),
                  ctx=ctx)
    C = mem_array((m, n), np.float32,
                  data=np.ones((m, n), np.float32), ctx=ctx)
    csrmm(A, B, C, beta=0.5, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), 0.5 * np.ones((m, n)),
                               rtol=1e-6)


def test_csrgemv_empty_matrix(ctx):
    a_sp = sps.csr_matrix((10, 7), dtype=np.float32)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    y = csrgemv(A, np.ones(7, np.float32), ctx=ctx)
    np.testing.assert_array_equal(y, np.zeros(10, np.float32))
    yt = csrgemv(A, np.ones(10, np.float32), trans="T", ctx=ctx)
    np.testing.assert_array_equal(yt, np.zeros(7, np.float32))


def test_csrcsc_empty_matrix(ctx):
    a_sp = sps.csr_matrix((12, 9), dtype=np.float32)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    At = csrcsc_scratch(A, ctx=ctx)
    assert At.nnz == 0
    np.testing.assert_array_equal(At.ia.read_all(),
                                  np.zeros(10, np.int64))


def test_csrmm_single_dense_row(ctx, rng):
    """One row holding every nnz (extreme skew: ELL range splitting)."""
    m, k, n = 50, 400, 16
    row = np.zeros((1, k), np.float32)
    row[0, :] = rng.standard_normal(k).astype(np.float32)
    dense = np.zeros((m, k), np.float32)
    dense[7] = row
    a_sp = sps.csr_matrix(dense)
    ctx.config.max_nnzs = 64  # nnz budget << the dense row
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b = rng.standard_normal((k, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, data=b, ctx=ctx)
    C = mem_array((m, n), np.float32, ctx=ctx)
    csrmm(A, B, C, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), dense @ b, rtol=1e-4,
                               atol=1e-4)


def test_sort_tiny(ctx):
    for n in (1, 2, 3):
        src = mem_array((n,), np.float32,
                        data=np.arange(n, 0, -1, dtype=np.float32), ctx=ctx)
        dst = mem_array((n,), np.float32, ctx=ctx)
        bof_sort(src, dst, blk_elems=4096, ctx=ctx)
        np.testing.assert_array_equal(dst.read_all(),
                                      np.arange(1, n + 1, dtype=np.float32))


def test_map_reduce_single_element(ctx):
    src = mem_array((1,), np.float32, data=np.array([9.0], np.float32),
                    ctx=ctx)
    dst = mem_array((1,), np.float32, ctx=ctx)
    import jax.numpy as jnp
    bof_map(src, dst, jnp.sqrt, ctx=ctx)
    assert dst.read_all()[0] == 3.0
    assert bof_reduce(dst, "sum", ctx=ctx) == 3.0


def test_ravel_view_map_over_matrix(ctx, rng):
    import jax.numpy as jnp
    m, n = 30, 20
    data = np.abs(rng.standard_normal((m, n))).astype(np.float32)
    arr = mem_array((m, n), np.float32, data=data, ctx=ctx)
    flat = arr.ravel_view()
    bof_map(flat, flat, jnp.sqrt, blk_elems=128, ctx=ctx)
    np.testing.assert_allclose(arr.read_all(), np.sqrt(data), rtol=1e-6)


def test_concurrent_kernels_share_context(ctx, rng):
    """Two gemms + a reduce running concurrently on one context must not
    interfere (shared tile cache, scheduler, io pool)."""
    import threading
    from bof_tpu.ops import gemm as _gemm
    m = n = k = 48
    mats = []
    for _ in range(2):
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((k, n)).astype(np.float32)
        A = mem_array((m, k), np.float32, data=a, ctx=ctx)
        B = mem_array((k, n), np.float32, data=b, ctx=ctx)
        C = mem_array((m, n), np.float32, ctx=ctx)
        mats.append((a, b, A, B, C))
    vec = rng.standard_normal(10_000).astype(np.float32)
    V = mem_array((10_000,), np.float32, data=vec, ctx=ctx)
    results = {}
    errs = []

    def run_gemm(i):
        try:
            _, _, A, B, C = mats[i]
            _gemm(A, B, C, blk=16, ctx=ctx)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def run_reduce():
        try:
            results["sum"] = bof_reduce(V, "sum", blk_elems=1024, ctx=ctx)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=run_gemm, args=(i,)) for i in range(2)]
    ts.append(threading.Thread(target=run_reduce))
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errs, errs
    for a, b, _A, _B, C in mats:
        np.testing.assert_allclose(C.read_all(), a @ b, rtol=2e-4,
                                   atol=1e-4)
    np.testing.assert_allclose(results["sum"],
                               vec.astype(np.float64).sum(), rtol=1e-6)
