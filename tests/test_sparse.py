"""Sparse kernel differential tests vs scipy golden models.

Mirrors the reference's differential strategy (in_mem_csrmm /
in_mem_csrgemv / in_mem_csrcsc drivers): random CSR matrices at several
sparsities, outputs compared against scipy.  Small nnz budgets force
multi-block planning.
"""
import numpy as np
import pytest
import scipy.sparse as sps

from bof_tpu import mem_array
from bof_tpu.sparse import (CsrFlashMatrix, csrcsc, csrcsc_scratch, csrgemv,
                            csrmm, fill_row_blocks)
from bof_tpu.sparse.csr import fill_row_blocks as frb


def rand_csr(rng, m, k, density):
    return sps.random(m, k, density=density, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(42))


def small_cfg(ctx, max_nnzs=2048, cblk=32):
    ctx.config.max_nnzs = max_nnzs
    ctx.config.csrmm_cblk_size = cblk
    return ctx


def test_fill_row_blocks():
    ia = np.array([0, 10, 10, 30, 31, 100, 100, 120], dtype=np.int64)
    blocks = fill_row_blocks(ia, 40)
    assert blocks[0][0] == 0 and blocks[-1][1] == 7
    # contiguity + budget (single-row blocks may exceed)
    prev = 0
    for r, e in blocks:
        assert r == prev
        prev = e
        if e - r > 1:
            assert ia[e] - ia[r] <= 40


@pytest.mark.parametrize("density", [0.002, 0.05])
@pytest.mark.parametrize("order_b", ["R", "C"])
def test_csrmm_n(ctx, rng, density, order_b):
    small_cfg(ctx)
    m, k, n = 300, 200, 70
    a_sp = rand_csr(rng, m, k, density)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    c_np = rng.standard_normal((m, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, order_b, data=b_np, ctx=ctx)
    C = mem_array((m, n), np.float32, "R", data=c_np, ctx=ctx)
    csrmm(A, B, C, alpha=1.5, beta=0.5, ctx=ctx)
    want = 1.5 * (a_sp @ b_np) + 0.5 * c_np
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-4, atol=1e-4)


def test_csrmm_c_order_output(ctx, rng):
    small_cfg(ctx)
    m, k, n = 150, 120, 40
    a_sp = rand_csr(rng, m, k, 0.03)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, "R", data=b_np, ctx=ctx)
    C = mem_array((m, n), np.float32, "C", ctx=ctx)
    csrmm(A, B, C, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), a_sp @ b_np, rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("path", ["streaming", "csrcsc"])
def test_csrmm_transposed(ctx, rng, path):
    """'T' dispatch, both structures: the one-pass streaming accumulate
    (host placement + C fits DRAM) and the csrcsc-materialize + recurse
    fallback (reference: csrmm.cpp:364-420), with alpha/beta."""
    small_cfg(ctx)
    if path == "streaming":
        ctx.config.sparse_compute = "host"  # streaming requires host mode
    else:
        ctx.config.sparse_compute = "device"  # forces csrcsc + recurse
    m, k, n = 180, 90, 30
    a_sp = rand_csr(rng, m, k, 0.04)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((m, n)).astype(np.float32)
    c0_np = rng.standard_normal((k, n)).astype(np.float32)
    B = mem_array((m, n), np.float32, "R", data=b_np, ctx=ctx)
    C = mem_array((k, n), np.float32, "R", data=c0_np, ctx=ctx)
    csrmm(A, B, C, alpha=0.5, beta=2.0, transa="T", ctx=ctx)
    np.testing.assert_allclose(C.read_all(),
                               0.5 * (a_sp.T @ b_np) + 2.0 * c0_np,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("trans", ["N", "T"])
def test_csrgemv(ctx, rng, trans):
    small_cfg(ctx, max_nnzs=512)
    m, k = 400, 250
    a_sp = rand_csr(rng, m, k, 0.02)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    x = rng.standard_normal(m if trans == "T" else k).astype(np.float32)
    got = csrgemv(A, x, trans=trans, ctx=ctx)
    want = (a_sp.T @ x) if trans == "T" else (a_sp @ x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_csrgemv_empty_rows(ctx, rng):
    small_cfg(ctx, max_nnzs=256)
    m, k = 100, 80
    a_sp = rand_csr(rng, m, k, 0.01)
    a_sp[40:60, :] = 0  # force empty rows
    a_sp.eliminate_zeros()
    A = CsrFlashMatrix.from_scipy(a_sp.tocsr(), ctx=ctx)
    x = rng.standard_normal(k).astype(np.float32)
    np.testing.assert_allclose(csrgemv(A, x, ctx=ctx), a_sp @ x,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("density", [0.005, 0.08])
def test_csrcsc_roundtrip(ctx, rng, density):
    small_cfg(ctx, max_nnzs=1024)
    m, k = 230, 170
    a_sp = rand_csr(rng, m, k, density)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    At = csrcsc_scratch(A, ctx=ctx)
    got = At.to_scipy()
    want = sps.csr_matrix(a_sp.T)
    want.sort_indices()
    np.testing.assert_array_equal(got.indptr, want.indptr)
    np.testing.assert_array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data, rtol=1e-6)


def test_csrcsc_rows_sorted_within_columns(ctx, rng):
    """A^T rows (= original column entries) must come out ascending."""
    small_cfg(ctx, max_nnzs=300)
    a_sp = rand_csr(rng, 120, 60, 0.1)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    At = csrcsc_scratch(A, ctx=ctx)
    ia = At.ia.read_all()
    ja = At.ja.read_all()
    for c in range(At.shape[0]):
        seg = ja[ia[c]:ia[c + 1]]
        assert np.all(np.diff(seg) > 0)


def test_csrmm_host_compute(ctx, rng):
    """sparse_compute='host' runs block products on CPU (reference model)."""
    small_cfg(ctx)
    ctx.config.sparse_compute = "host"
    m, k, n = 200, 150, 48
    a_sp = rand_csr(rng, m, k, 0.03)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, "R", data=b_np, ctx=ctx)
    C = mem_array((m, n), np.float32, "R", ctx=ctx)
    csrmm(A, B, C, alpha=2.0, beta=0.25,
          ctx=ctx)
    c0 = np.zeros((m, n), np.float32)
    want = 2.0 * (a_sp @ b_np) + 0.25 * c0
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-4, atol=1e-4)


def test_csrmm_k_split(ctx, rng):
    """Tiny HBM budget forces K-range splitting with C accumulation."""
    small_cfg(ctx, max_nnzs=1024, cblk=16)
    ctx.config.hbm_budget = 3 * 4096 * 16 * 4  # forces k_r = 4096 ranges
    m, k, n = 150, 10_000, 24
    a_sp = rand_csr(rng, m, k, 0.003)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    c_np = rng.standard_normal((m, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, "R", data=b_np, ctx=ctx)
    C = mem_array((m, n), np.float32, "R", data=c_np, ctx=ctx)
    csrmm(A, B, C, alpha=1.25, beta=0.5, ctx=ctx)
    want = 1.25 * (a_sp @ b_np) + 0.5 * c_np
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-4, atol=1e-4)


def test_csrmm_k_split_host_compute(ctx, rng):
    small_cfg(ctx, max_nnzs=512, cblk=8)
    ctx.config.hbm_budget = 3 * 4096 * 8 * 4
    ctx.config.sparse_compute = "host"
    m, k, n = 90, 9000, 8
    a_sp = rand_csr(rng, m, k, 0.004)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, "R", data=b_np, ctx=ctx)
    C = mem_array((m, n), np.float32, "R", ctx=ctx)
    csrmm(A, B, C, ctx=ctx)
    np.testing.assert_allclose(C.read_all(), a_sp @ b_np, rtol=1e-4,
                               atol=1e-4)


def test_sparse_compute_auto_dispatch(monkeypatch):
    """'auto' places block products by comparing estimated link-transfer
    time against host compute time; a real-host link always picks the
    device."""
    import importlib
    csrmm_mod = importlib.import_module("bof_tpu.sparse.csrmm")
    from bof_tpu.config import FlashConfig

    cfg = FlashConfig(sparse_compute="auto")
    monkeypatch.setattr("bof_tpu.ops.device.link_gbps_estimate",
                        lambda force=False: 20.0)  # real TPU host
    assert csrmm_mod._resolve_sparse_compute(
        cfg, 1 << 20, 1 << 16, 1024, 1 << 27) == "device"
    monkeypatch.setattr("bof_tpu.ops.device.link_gbps_estimate",
                        lambda force=False: 0.04)  # dev tunnel
    # small problem on a thin link: host wins
    assert csrmm_mod._resolve_sparse_compute(
        cfg, 1 << 16, 1 << 14, 512, 1 << 23) == "host"
    # explicit modes bypass the heuristic
    assert csrmm_mod._resolve_sparse_compute(
        FlashConfig(sparse_compute="device"), 8, 8, 8, 8) == "device"
    assert csrmm_mod._resolve_sparse_compute(
        FlashConfig(sparse_compute="host"), 8, 8, 8, 8) == "host"


def test_csrcsc_preserves_explicit_zeros_and_duplicates(ctx):
    """Legal CSR inputs may carry explicit zero values and duplicate
    (row, col) entries; the transpose must preserve every stored entry in
    stable order (regression: a sparse-addition merge pruned/summed them)."""
    small_cfg(ctx, max_nnzs=4)  # forces multi-fragment phase-2 merges
    # rows: 0:[c1=0.0(explicit), c2=5], 1:[c1=1, c1=2(dup), c2=0.0], 2:[c0=7]
    ia = np.array([0, 2, 5, 6], np.int64)
    ja = np.array([1, 2, 1, 1, 2, 0], np.int64)
    va = np.array([0.0, 5.0, 1.0, 2.0, 0.0, 7.0], np.float32)
    from bof_tpu import mem_array
    A = CsrFlashMatrix(
        mem_array((4,), np.int64, data=ia, ctx=ctx),
        mem_array((6,), np.int64, data=ja, ctx=ctx),
        mem_array((6,), np.float32, data=va, ctx=ctx), (3, 3))
    At = csrcsc_scratch(A, ctx=ctx)
    np.testing.assert_array_equal(At.read_ia(), [0, 1, 4, 6])
    # col 1 entries in ascending-source-row stable order: row0(0.0),
    # row1(1.0), row1(2.0 dup)
    np.testing.assert_array_equal(At.ja.read_all(), [2, 0, 1, 1, 0, 1])
    np.testing.assert_allclose(At.vals.read_all(),
                               [7.0, 0.0, 1.0, 2.0, 5.0, 0.0])
    for arr in (At.ia, At.ja, At.vals):
        from bof_tpu import flash_free
        flash_free(arr)


def test_csrmm_telemetry_sync_mode(ctx, rng):
    """telemetry_sync through the csrmm device pipeline: results
    unchanged, per-stage h2d/accum_wait/d2h split recorded with per-tile
    rate samples (bench truth mode, mirrors the gemm test)."""
    import scipy.sparse as sps
    from bof_tpu import mem_array
    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    from bof_tpu.utils import METRICS
    ctx.config.sparse_compute = "device"
    ctx.config.telemetry_sync = True
    try:
        m, k, n = 300, 120, 64
        a_sp = sps.random(m, k, density=0.05, format="csr",
                          dtype=np.float32,
                          random_state=np.random.RandomState(11))
        A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
        B = mem_array((k, n), np.float32,
                      data=rng.standard_normal((k, n)).astype(np.float32),
                      ctx=ctx)
        C = mem_array((m, n), np.float32, ctx=ctx)
        n_h2d = len(METRICS.samples("csrmm.h2d_tile_gbps"))
        before = METRICS.snapshot()
        csrmm(A, B, C, ctx=ctx)
        after = METRICS.snapshot()
        np.testing.assert_allclose(C.read_all(), a_sp @ B.read_all(),
                                   rtol=2e-4, atol=1e-4)
        assert after.get("csrmm.h2d_s", 0) > before.get("csrmm.h2d_s", 0)
        assert after.get("csrmm.d2h_s", 0) > before.get("csrmm.d2h_s", 0)
        assert "csrmm.accum_wait_s" in after
        assert len(METRICS.samples("csrmm.h2d_tile_gbps")) > n_h2d
    finally:
        ctx.config.telemetry_sync = False
        ctx.config.sparse_compute = "auto"


def test_csrmm_sorted_ell_banding(ctx, rng):
    """Count-sorted ELL banding: skewed blocks (mega-rows + near-empty
    rows) must produce identical results with and without sorting, and
    sorting must build strictly fewer padded ELL entries."""
    import scipy.sparse as sps
    from bof_tpu import mem_array
    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    from bof_tpu.sparse import spmm_device as sdev
    ctx.config.sparse_compute = "device"
    ctx.config.max_nnzs = 1 << 14
    try:
        m, k, n = 400, 150, 48
        a_sp = sps.random(m, k, density=0.03, format="csr",
                          dtype=np.float32,
                          random_state=np.random.RandomState(21)).tolil()
        for r in (17, 150, 388):
            a_sp[r, :] = rng.standard_normal(k)  # mega-rows
        a_sp = a_sp.tocsr()
        A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
        B = mem_array((k, n), np.float32,
                      data=rng.standard_normal((k, n)).astype(np.float32),
                      ctx=ctx)
        want = a_sp @ B.read_all()
        got = {}
        for flag in (True, False):
            ctx.config.ell_sort_rows = flag
            C = mem_array((m, n), np.float32, ctx=ctx)
            csrmm(A, B, C, ctx=ctx)
            got[flag] = C.read_all()
            np.testing.assert_allclose(got[flag], want, rtol=2e-4,
                                       atol=1e-4)
        # sorted vs unsorted pick different padded reduction widths ->
        # low-bit fp drift is legitimate; values must agree to rounding
        np.testing.assert_allclose(got[True], got[False], rtol=1e-6,
                                   atol=1e-6)

        # padding economics on the skewed counts: sorted banding builds
        # fewer (rows_pad * rmax) entries than contiguous ranging
        counts = np.diff(a_sp.indptr)

        def entries(ordered):
            total = 0
            for s0, s1 in sdev.ell_row_ranges(ordered, 1 << 12):
                rp, rm = sdev.ell_dims(ordered[s0:s1])
                total += rp * rm
            return total
        sorted_entries = entries(np.sort(counts))
        plain_entries = entries(counts)
        assert sorted_entries < plain_entries, (sorted_entries,
                                                plain_entries)
    finally:
        ctx.config.ell_sort_rows = True
        ctx.config.sparse_compute = "auto"

def test_ell_idx_narrow(ctx, rng):
    """uint16 ELL index transfer: the ja half of an ELL upload is pure
    link bytes (device kernels widen to int32 in HBM), so panels whose
    height fits 16 bits ship half the index bytes with bit-identical
    results."""
    import scipy.sparse as sps
    from bof_tpu import mem_array
    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    from bof_tpu.sparse import spmm_device as sdev

    # dtype selection is deterministic in (panel height, flag)
    assert sdev.ell_idx_dtype(65536) == np.uint16
    assert sdev.ell_idx_dtype(65537) == np.int32
    assert sdev.ell_idx_dtype(1024, narrow=False) == np.int32
    assert sdev.ell_idx_dtype(0) == np.int32

    # unit: uint16 ELL gathers bit-identically to int32 ELL
    k, n = 300, 32
    ia = np.array([0, 3, 3, 7, 12], np.int64)
    ja = rng.integers(0, k, 12).astype(np.int64)
    va = rng.standard_normal(12).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    ja16, va16 = sdev.to_ell(ia, ja, va, idx_dtype=np.uint16)
    ja32, va32 = sdev.to_ell(ia, ja, va, idx_dtype=np.int32)
    assert ja16.dtype == np.uint16 and ja32.dtype == np.int32
    np.testing.assert_array_equal(ja16.astype(np.int32), ja32)
    out16 = np.asarray(sdev.spmm_ell_block(b, ja16, va16))
    out32 = np.asarray(sdev.spmm_ell_block(b, ja32, va32))
    np.testing.assert_array_equal(out16, out32)

    # boundary: index 65535 must round-trip through uint16
    ia2 = np.array([0, 1], np.int64)
    ja2 = np.array([65535], np.int64)
    va2 = np.array([1.0], np.float32)
    j16, _ = sdev.to_ell(ia2, ja2, va2, idx_dtype=np.uint16)
    assert int(j16[0, 0]) == 65535

    # end-to-end: csrmm identical with the flag on and off
    ctx.config.sparse_compute = "device"
    ctx.config.max_nnzs = 1 << 14
    try:
        m, kk, nn = 257, 300, 40
        a_sp = sps.random(m, kk, density=0.05, format="csr",
                          dtype=np.float32,
                          random_state=np.random.RandomState(7))
        A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
        B = mem_array((kk, nn), np.float32,
                      data=rng.standard_normal((kk, nn)).astype(np.float32),
                      ctx=ctx)
        got = {}
        for flag in (True, False):
            ctx.config.ell_idx_narrow = flag
            C = mem_array((m, nn), np.float32, ctx=ctx)
            csrmm(A, B, C, ctx=ctx)
            got[flag] = C.read_all()
        np.testing.assert_array_equal(got[True], got[False])
        np.testing.assert_allclose(got[True], a_sp @ B.read_all(),
                                   rtol=2e-4, atol=1e-4)
    finally:
        ctx.config.ell_idx_narrow = True
        ctx.config.sparse_compute = "auto"

def test_sparse_bf16_value_transfer(ctx, rng):
    """transfer_dtype='bfloat16' ships the va half of ELL uploads as
    bf16 (promoted to panel dtype in HBM before the reduce); results
    track f32 within bf16 input-rounding tolerance."""
    import scipy.sparse as sps
    from bof_tpu import mem_array
    from bof_tpu.sparse import CsrFlashMatrix, csrmm, csrgemv
    from bof_tpu.sparse import spmm_device as sdev

    class _C:  # minimal cfg stand-ins
        transfer_dtype = "bfloat16"

    class _C32:
        transfer_dtype = "float32"

    class _CQ:
        transfer_dtype = "int8"

    import ml_dtypes
    assert sdev.ell_val_dtype(np.float32, _C) == np.dtype(ml_dtypes.bfloat16)
    assert sdev.ell_val_dtype(np.float32, _C32) == np.float32
    assert sdev.ell_val_dtype(np.float64, _C) == np.float64  # opt-out
    assert sdev.ell_val_dtype(np.float32, _CQ) == np.float32  # int8 -> f32

    # unit: to_ell with bf16 val_dtype produces a 2-byte array and the
    # device reduce matches the f32 path to input-rounding error
    k, n = 256, 32
    ia = np.array([0, 4, 9, 9, 16], np.int64)
    ja = rng.integers(0, k, 16).astype(np.int64)
    va = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    jb, vb = sdev.to_ell(ia, ja, va, val_dtype=np.dtype(ml_dtypes.bfloat16))
    assert vb.dtype == ml_dtypes.bfloat16 and vb.itemsize == 2
    out_b = np.asarray(sdev.spmm_ell_block(b, jb, vb))
    j32, v32 = sdev.to_ell(ia, ja, va)
    out_32 = np.asarray(sdev.spmm_ell_block(b, j32, v32))
    assert out_b.dtype == out_32.dtype == np.float32
    np.testing.assert_allclose(out_b, out_32, rtol=2e-2, atol=2e-2)

    # end-to-end csrmm + csrgemv under the opt-in flag
    ctx.config.sparse_compute = "device"
    ctx.config.max_nnzs = 1 << 14
    ctx.config.transfer_dtype = "bfloat16"
    try:
        m, kk, nn = 300, 200, 24
        a_sp = sps.random(m, kk, density=0.05, format="csr",
                          dtype=np.float32,
                          random_state=np.random.RandomState(9))
        A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
        b_np = rng.standard_normal((kk, nn)).astype(np.float32)
        B = mem_array((kk, nn), np.float32, data=b_np, ctx=ctx)
        C = mem_array((m, nn), np.float32, ctx=ctx)
        csrmm(A, B, C, ctx=ctx)
        want = a_sp @ b_np
        scale = max(float(np.abs(want).max()), 1.0)
        assert float(np.abs(C.read_all() - want).max()) / scale < 2e-2
        x = rng.standard_normal(kk).astype(np.float32)
        y = csrgemv(A, x, ctx=ctx)
        yscale = max(float(np.abs(a_sp @ x).max()), 1.0)
        assert float(np.abs(y - a_sp @ x).max()) / yscale < 2e-2
    finally:
        ctx.config.transfer_dtype = "float32"
        ctx.config.sparse_compute = "auto"


def test_sparse_int8_value_transfer(ctx, rng):
    """transfer_dtype='int8' ships ELL values as int8 with a per-ROW
    max-abs scale (4 -> 1 byte/nnz on the link); the device promote
    rebuilds row-relative values within the 1/254 quantization band and
    the reduce still accumulates at panel precision."""
    import scipy.sparse as sps
    from bof_tpu import mem_array
    from bof_tpu.sparse import CsrFlashMatrix, csrmm, csrgemv
    from bof_tpu.sparse import spmm_device as sdev

    class _CQ:
        transfer_dtype = "int8"

    assert sdev.ell_val_quantize(np.float32, _CQ)
    assert not sdev.ell_val_quantize(np.float64, _CQ)  # precision opt-out

    # unit: roundtrip bands, zero rows, negative maxima, power-law skew
    va = np.zeros((4, 8), np.float32)
    va[0, :3] = [1000.0, -0.5, 2.0]          # wide dynamic range row
    va[1] = 0.0                              # all-zero (padding-only) row
    va[2, :2] = [-3.0, -254.0]               # negative max-abs
    va[3, :8] = 1e-4                         # tiny-but-uniform row
    q, sc = sdev.quantize_ell_i8(va)
    assert q.dtype == np.int8 and sc.dtype == np.float32
    assert sc[1] == 1.0 and not q[1].any()   # zero row stays exact
    rt = q.astype(np.float32) * sc[:, None]
    # per-entry error bounded by half a quantum of the ROW's scale
    assert np.abs(rt - va).max(axis=1).max() <= (sc / 2 + 1e-9).max()
    np.testing.assert_allclose(rt[3], va[3], rtol=1 / 127)  # tiny row kept

    # device reduce with tuple values matches the f32 path in-band
    k, n = 256, 32
    ia = np.array([0, 4, 9, 9, 16], np.int64)
    ja = rng.integers(0, k, 16).astype(np.int64)
    vv = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    j32, v32 = sdev.to_ell(ia, ja, vv)
    out_32 = np.asarray(sdev.spmm_ell_block(b, j32, v32))
    out_q = np.asarray(sdev.spmm_ell_block(b, j32,
                                           sdev.quantize_ell_i8(v32)))
    assert out_q.dtype == np.float32
    np.testing.assert_allclose(out_q, out_32, rtol=3e-2, atol=3e-2)
    # dispatch routes tuple values to the XLA body (pallas can't)
    out_d = np.asarray(sdev.spmm_ell_block_dispatch(
        b, j32, sdev.quantize_ell_i8(v32), impl="pallas"))
    np.testing.assert_allclose(out_d, out_q, rtol=0, atol=0)

    # end-to-end csrmm + csrgemv under the opt-in flag
    ctx.config.sparse_compute = "device"
    ctx.config.max_nnzs = 1 << 14
    ctx.config.transfer_dtype = "int8"
    try:
        m, kk, nn = 300, 200, 24
        a_sp = sps.random(m, kk, density=0.05, format="csr",
                          dtype=np.float32,
                          random_state=np.random.RandomState(10))
        A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
        b_np = rng.standard_normal((kk, nn)).astype(np.float32)
        B = mem_array((kk, nn), np.float32, data=b_np, ctx=ctx)
        C = mem_array((m, nn), np.float32, ctx=ctx)
        csrmm(A, B, C, ctx=ctx)
        want = a_sp @ b_np
        scale = max(float(np.abs(want).max()), 1.0)
        assert float(np.abs(C.read_all() - want).max()) / scale < 3e-2
        x = rng.standard_normal(kk).astype(np.float32)
        y = csrgemv(A, x, ctx=ctx)
        yscale = max(float(np.abs(a_sp @ x).max()), 1.0)
        assert float(np.abs(y - a_sp @ x).max()) / yscale < 3e-2
    finally:
        ctx.config.transfer_dtype = "float32"
        ctx.config.sparse_compute = "auto"


def test_sparse_bf16_c_transfer(ctx, rng):
    """c_transfer_dtype='bfloat16' rounds csrmm device result blocks once
    on device before D2H: error is one bf16 output rounding; the host
    path and fp64 are untouched."""
    import scipy.sparse as sps
    from bof_tpu import mem_array
    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    ctx.config.sparse_compute = "device"
    ctx.config.max_nnzs = 1 << 14
    ctx.config.c_transfer_dtype = "bfloat16"
    try:
        m, kk, nn = 300, 200, 24
        a_sp = sps.random(m, kk, density=0.05, format="csr",
                          dtype=np.float32,
                          random_state=np.random.RandomState(11))
        A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
        b_np = rng.standard_normal((kk, nn)).astype(np.float32)
        B = mem_array((kk, nn), np.float32, data=b_np, ctx=ctx)
        C = mem_array((m, nn), np.float32, ctx=ctx)
        csrmm(A, B, C, alpha=1.5, ctx=ctx)
        want = 1.5 * (a_sp @ b_np)
        scale = max(float(np.abs(want).max()), 1.0)
        rel = float(np.abs(C.read_all() - want).max()) / scale
        assert rel < 1e-2, rel          # one bf16 output rounding
        # host placement ignores the flag entirely (exact f32 path)
        ctx.config.sparse_compute = "host"
        C2 = mem_array((m, nn), np.float32, ctx=ctx)
        csrmm(A, B, C2, alpha=1.5, ctx=ctx)
        np.testing.assert_allclose(C2.read_all(), want, rtol=2e-4,
                                   atol=1e-4)
    finally:
        ctx.config.c_transfer_dtype = "float32"
        ctx.config.sparse_compute = "auto"


def test_csrmm_float64_exact_without_x64(ctx, rng):
    """float64 CSR on a backend that would narrow it (x64 off in the
    suite): csrmm must route to the exact scipy host path regardless of
    sparse_compute='device' — silent f32 narrowing through the device
    was the failure mode (reference FP_DOUBLE_PRECISION csrmm,
    bof_types.h:24-42)."""
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 on: device path is exact")
    small_cfg(ctx)
    old = getattr(ctx.config, "sparse_compute", "device")
    ctx.config.sparse_compute = "device"
    try:
        m, k, n = 200, 150, 40
        a_sp = sps.random(m, k, density=0.05, format="csr",
                          dtype=np.float64,
                          random_state=np.random.RandomState(7))
        # magnitudes whose f32 round-trip is visibly lossy
        a_sp.data *= 10.0 ** rng.uniform(-9, 9, a_sp.nnz)
        A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx,
                                      val_dtype=np.float64)
        b_np = rng.standard_normal((k, n))
        c_np = rng.standard_normal((m, n))
        B = mem_array((k, n), np.float64, data=b_np, ctx=ctx)
        C = mem_array((m, n), np.float64, data=c_np, ctx=ctx)
        csrmm(A, B, C, alpha=1.5, beta=0.5, ctx=ctx)
        want = 1.5 * (a_sp @ b_np) + 0.5 * c_np
        np.testing.assert_allclose(C.read_all(), want, rtol=1e-13)
    finally:
        ctx.config.sparse_compute = old


def test_csrgemv_float64_exact_without_x64(ctx, rng):
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 on: device path is exact")
    small_cfg(ctx)
    m, k = 300, 120
    a_sp = sps.random(m, k, density=0.08, format="csr", dtype=np.float64,
                      random_state=np.random.RandomState(8))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx, val_dtype=np.float64)
    x = rng.standard_normal(k)
    y = csrgemv(A, x, ctx=ctx)
    assert y.dtype == np.float64
    np.testing.assert_allclose(y, a_sp @ x, rtol=1e-13)
    yt = csrgemv(A, rng.standard_normal(m), trans="T", ctx=ctx)
    assert yt.dtype == np.float64


def test_csrmm_sharded_float64_rejected_without_x64(ctx, rng):
    """csrmm_sharded is device-only compute: fp64 it cannot represent
    must be a clear error, never a silent narrowing."""
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 on: sharded fp64 is exact on the CPU mesh")
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from bof_tpu.parallel import csrmm_sharded, make_mesh
    a_sp = sps.random(64, 48, density=0.1, format="csr", dtype=np.float64,
                      random_state=np.random.RandomState(9))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx, val_dtype=np.float64)
    B = mem_array((48, 8), np.float64, ctx=ctx)
    C = mem_array((64, 8), np.float64, ctx=ctx)
    with pytest.raises(ValueError, match="narrowed|x64"):
        csrmm_sharded(A, B, C, mesh=make_mesh(8), ctx=ctx)


def test_csrcsc_rejects_row_count_past_index_dtype(ctx):
    """int32 indices that fit A's columns can silently wrap on A's ROW
    count (the transpose's column indices); must be a loud error."""
    import scipy.sparse as sps

    from bof_tpu.sparse import CsrFlashMatrix
    from bof_tpu.sparse.csrcsc import csrcsc
    a_sp = sps.random(40, 30, density=0.1, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(5))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx, idx_dtype=np.int32)
    A.shape = (2**31 + 8, 30)  # simulate a giant row count
    out_ia = mem_array((31,), np.int64, ctx=ctx)
    out_ja = mem_array((A.nnz,), np.int32, ctx=ctx)
    out_vals = mem_array((A.nnz,), np.float32, ctx=ctx)
    out = CsrFlashMatrix(out_ia, out_ja, out_vals, (30, 2**31 + 8))
    with pytest.raises(ValueError, match="index dtype"):
        csrcsc(A, out, ctx=ctx)


def test_native_ell_fill_matches_numpy(rng):
    """The native single-pass ELL gather (io/native.py ell_fill ->
    bof_ell_fill) must be BIT-identical to the numpy _ell_fill chain for
    every supported dtype combination — int32/uint16 indices, f32/bf16/
    f64 values, NaNs included (the bf16 rounding must match ml_dtypes) —
    across ragged counts, zero-count rows, and row padding."""
    import ml_dtypes

    from bof_tpu.io.native import ell_fill, load_library
    from bof_tpu.sparse import spmm_device as sdev

    if load_library() is None:
        import pytest
        pytest.skip("native engine unavailable")

    def numpy_fill(starts, counts, ja, va, rows_pad, rmax, idt, vdt):
        rows = len(counts)
        slots = np.arange(rmax, dtype=np.int64)[None, :]
        idx = np.minimum(starts[:, None] + slots, max(len(ja) - 1, 0))
        mask = slots < counts[:, None]
        ja_ell = np.zeros((rows_pad, rmax), idt)
        va_ell = np.zeros((rows_pad, rmax), vdt or va.dtype)
        if len(ja):
            ja_ell[:rows] = np.where(mask, ja[idx], 0).astype(idt)
            va_ell[:rows] = np.where(mask, va[idx], 0)
        return ja_ell, va_ell

    for vdt_in, vdt_out in ((np.float32, None),
                            (np.float32, np.dtype(ml_dtypes.bfloat16)),
                            (np.float64, None)):
        counts = rng.integers(0, 9, 37).astype(np.int64)
        counts[5] = 0
        nnz = int(counts.sum())
        starts = np.zeros(37, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        ja = rng.integers(0, 60000, nnz).astype(np.int64)
        va = rng.standard_normal(nnz).astype(vdt_in)
        if nnz > 3:
            va[3] = np.nan  # bf16 NaN handling must match ml_dtypes
        for idt in (np.int32, np.uint16):
            rows_pad, rmax = 64, 16
            nat = ell_fill(starts, counts, ja, va, rows_pad, rmax,
                           idt, vdt_out)
            assert nat is not None
            ref = numpy_fill(starts, counts, ja, va, rows_pad, rmax,
                             idt, vdt_out)
            np.testing.assert_array_equal(nat[0], ref[0])
            np.testing.assert_array_equal(
                nat[1].view(np.uint16 if vdt_out is not None
                            and vdt_out.itemsize == 2 else nat[1].dtype),
                ref[1].view(np.uint16 if vdt_out is not None
                            and vdt_out.itemsize == 2 else ref[1].dtype))

    # unsupported combos fall back (return None) instead of corrupting
    assert ell_fill(np.zeros(1, np.int64), np.ones(1, np.int64),
                    np.zeros(1, np.int32), np.zeros(1, np.float32),
                    8, 8, np.int32, None) is None

    # inconsistent CSR metadata (starts+counts past the block's nnz —
    # a truncated ia) must clamp to the allocation, never read out of
    # bounds: the in-range prefix is gathered, the overhang is zeroed
    starts_bad = np.array([0, 2], np.int64)
    counts_bad = np.array([2, 99], np.int64)  # row 1 claims 99 of 4 nnz
    ja4 = np.array([7, 8, 9, 10], np.int64)
    va4 = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    out = ell_fill(starts_bad, counts_bad, ja4, va4, 2, 8,
                   np.int32, None)
    assert out is not None
    j_b, v_b = out
    np.testing.assert_array_equal(j_b[1], [9, 10, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(v_b[1], [3, 4, 0, 0, 0, 0, 0, 0])

    # the routed public path still agrees with spmm end-to-end
    ia = np.array([0, 3, 3, 7, 12], np.int64)
    ja2 = rng.integers(0, 300, 12).astype(np.int64)
    va2 = rng.standard_normal(12).astype(np.float32)
    j32, v32 = sdev.to_ell(ia, ja2, va2)
    assert j32.dtype == np.int32 and v32.dtype == np.float32
    want = np.zeros((4, 300), np.float32)
    for r in range(4):
        for p in range(int(ia[r]), int(ia[r + 1])):
            want[r, ja2[p]] += va2[p]
    got = np.zeros_like(want)
    rows, rmax = v32.shape[0], v32.shape[1]
    for r in range(4):
        for s in range(rmax):
            got[r, j32[r, s]] += v32[r, s]
    np.testing.assert_allclose(got, want, rtol=1e-6)
