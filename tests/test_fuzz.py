"""Randomized differential fuzzing of the kernel planners.

The reference's misc/gemm_run.sh sweeps the 8 transpose/order configs at
one size; this goes further: seeded random shapes, leading dimensions
(ld-padded sub-matrices), orders, transposes, alpha/beta and block sizes,
every case checked against a float64 numpy golden model.  Catches planner
edge cases (ragged tails, ld arithmetic, storage-major gathers) that the
fixed-size tests can't.
"""
import os

import numpy as np
import pytest

# deeper sweeps on demand: BOF_FUZZ_CASES=100 python -m pytest tests/test_fuzz.py
_N = int(os.environ.get("BOF_FUZZ_CASES", "0"))

from bof_tpu import FlashArray, mem_array
from bof_tpu.ops import gemm
from bof_tpu.sparse import CsrFlashMatrix, csrmm


def _padded_operand(rng, rows, cols, order, ctx):
    """A logical (rows, cols) array stored as an ld-padded sub-matrix of a
    bigger parent, with a random interior offset."""
    lines, width = (rows, cols) if order == "R" else (cols, rows)
    pad = int(rng.integers(0, 7))
    off_lines = int(rng.integers(0, 3))
    off_in = int(rng.integers(0, pad + 1))
    ld = width + pad
    parent = mem_array(((lines + off_lines) * ld,), np.float32, ctx=ctx,
                       data=rng.standard_normal(
                           (lines + off_lines) * ld).astype(np.float32))
    arr = FlashArray(parent.store, (rows, cols), np.float32, order,
                     offset=(off_lines * ld + off_in) * 4, ld=ld, ctx=ctx)
    data = rng.standard_normal((rows, cols)).astype(np.float32)
    arr.write_block(0, data)
    return arr, data


@pytest.mark.parametrize("case", range(_N or 10))
def test_gemm_fuzz(case, ctx):
    rng = np.random.default_rng(1000 + case)
    m = int(rng.integers(3, 150))
    n = int(rng.integers(3, 150))
    k = int(rng.integers(3, 150))
    ta, tb = bool(rng.integers(2)), bool(rng.integers(2))
    orders = [("R", "C")[rng.integers(2)] for _ in range(3)]
    alpha = float(rng.uniform(-2, 2))
    beta = float(rng.choice([0.0, 1.0, rng.uniform(-1, 1)]))
    blk = int(rng.choice([16, 32, 64, 128]))

    A, a_np = _padded_operand(rng, *((k, m) if ta else (m, k)),
                              orders[0], ctx)
    B, b_np = _padded_operand(rng, *((n, k) if tb else (k, n)),
                              orders[1], ctx)
    C, c_np = _padded_operand(rng, m, n, orders[2], ctx)

    gemm(A, B, C, alpha=alpha, beta=beta,
         transa="T" if ta else "N", transb="T" if tb else "N",
         blk=blk, ctx=ctx)
    opa = a_np.T if ta else a_np
    opb = b_np.T if tb else b_np
    want = (alpha * (opa.astype(np.float64) @ opb.astype(np.float64))
            + beta * c_np.astype(np.float64))
    got = C.read_block(0, m, 0, n).astype(np.float64)
    denom = max(float(np.abs(want).max()), 1.0)
    assert float(np.abs(got - want).max()) / denom < 5e-4, (
        f"case {case}: m{m} n{n} k{k} ta{ta} tb{tb} orders{orders} "
        f"alpha{alpha:.3f} beta{beta:.3f} blk{blk}")


def _padded_operand64(rng, rows, cols, order, ctx):
    """float64 twin of _padded_operand (ld-padded sub-matrix)."""
    lines, width = (rows, cols) if order == "R" else (cols, rows)
    pad = int(rng.integers(0, 7))
    off_lines = int(rng.integers(0, 3))
    off_in = int(rng.integers(0, pad + 1))
    ld = width + pad
    parent = mem_array(((lines + off_lines) * ld,), np.float64, ctx=ctx,
                       data=rng.standard_normal((lines + off_lines) * ld))
    arr = FlashArray(parent.store, (rows, cols), np.float64, order,
                     offset=(off_lines * ld + off_in) * 8, ld=ld, ctx=ctx)
    data = rng.standard_normal((rows, cols))
    # per-row decade swings exercise the per-row/col sigma machinery
    data = data * 10.0 ** rng.uniform(-8, 8, (rows, 1))
    arr.write_block(0, data)
    return arr, data


@pytest.mark.parametrize("case", range(_N or 8))
def test_gemm64_fuzz(case, ctx):
    """Sliced fp64 path under the same planner fuzz: random shapes, ld
    padding, layouts, transposes, alpha/beta, block sizes — near-eps
    accuracy everywhere (ops/gemm64.py)."""
    ctx.config.fp64_device = "sliced"
    rng = np.random.default_rng(7000 + case)
    m = int(rng.integers(3, 120))
    n = int(rng.integers(3, 120))
    k = int(rng.integers(3, 120))
    ta, tb = bool(rng.integers(2)), bool(rng.integers(2))
    orders = [("R", "C")[rng.integers(2)] for _ in range(3)]
    alpha = float(rng.uniform(-2, 2))
    beta = float(rng.choice([0.0, 1.0, rng.uniform(-1, 1)]))
    blk = int(rng.choice([16, 32, 64]))

    A, a_np = _padded_operand64(rng, *((k, m) if ta else (m, k)),
                                orders[0], ctx)
    B, b_np = _padded_operand64(rng, *((n, k) if tb else (k, n)),
                                orders[1], ctx)
    C, c_np = _padded_operand64(rng, m, n, orders[2], ctx)

    gemm(A, B, C, alpha=alpha, beta=beta,
         transa="T" if ta else "N", transb="T" if tb else "N",
         blk=blk, ctx=ctx)
    opa = a_np.T if ta else a_np
    opb = b_np.T if tb else b_np
    want = alpha * (opa @ opb) + beta * c_np
    got = C.read_block(0, m, 0, n)
    scale = (np.abs(opa).max(axis=1)[:, None]
             * np.abs(opb).max(axis=0)[None, :]) * k
    err = float((np.abs(got - want) / np.maximum(scale, 1e-300)).max())
    assert err < 1e-12, (
        f"case {case}: m{m} n{n} k{k} ta{ta} tb{tb} orders{orders} "
        f"alpha{alpha:.3f} beta{beta:.3f} blk{blk} err{err:.2e}")


@pytest.mark.parametrize("case", range(_N or 8))
def test_csrmm_fuzz(case, ctx):
    import scipy.sparse as sps
    rng = np.random.default_rng(2000 + case)
    m = int(rng.integers(10, 400))
    k = int(rng.integers(10, 300))
    n = int(rng.integers(2, 100))
    density = float(rng.uniform(0.005, 0.15))
    alpha = float(rng.uniform(-2, 2))
    beta = float(rng.choice([0.0, rng.uniform(-1, 1)]))
    transa = "T" if rng.integers(2) else "N"
    order_b = ("R", "C")[rng.integers(2)]
    order_c = ("R", "C")[rng.integers(2)]
    ctx.config.max_nnzs = int(rng.choice([256, 1024, 1 << 20]))
    ctx.config.csrmm_cblk_size = int(rng.choice([16, 64, 4096]))
    # placement now picks the 'T' structure (streaming vs csrcsc+recurse)
    ctx.config.sparse_compute = str(rng.choice(["host", "device", "auto"]))

    a_sp = sps.random(m, k, density=density, format="csr",
                      dtype=np.float32,
                      random_state=np.random.RandomState(case))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    out_rows = k if transa == "T" else m
    b_rows = m if transa == "T" else k
    b_np = rng.standard_normal((b_rows, n)).astype(np.float32)
    c_np = rng.standard_normal((out_rows, n)).astype(np.float32)
    B = mem_array((b_rows, n), np.float32, order=order_b, data=b_np,
                  ctx=ctx)
    C = mem_array((out_rows, n), np.float32, order=order_c, data=c_np,
                  ctx=ctx)
    csrmm(A, B, C, alpha=alpha, beta=beta, transa=transa, ctx=ctx)
    opa = a_sp.T if transa == "T" else a_sp
    want = alpha * (opa.astype(np.float64) @ b_np.astype(np.float64)) \
        + beta * c_np.astype(np.float64)
    got = C.read_all().astype(np.float64)
    denom = max(float(np.abs(want).max()), 1.0)
    assert float(np.abs(got - want).max()) / denom < 5e-4, (
        f"case {case}: m{m} k{k} n{n} d{density:.3f} ta{transa} "
        f"ob{order_b} a{alpha:.3f} b{beta:.3f}")


@pytest.mark.parametrize("case", range(_N or 6))
def test_xml_rank_fuzz(case, ctx):
    """Random shapes/k/label blocks on both xml_rank paths vs the dense
    golden top-k (order/tie-robust: scores must match the sorted golden
    top-k and each reported label's true score must equal its reported
    score)."""
    import scipy.sparse as sps

    from bof_tpu.apps import xml_rank
    from bof_tpu.core.flash_array import flash_empty

    rng = np.random.default_rng(3000 + case)
    docs = int(rng.integers(10, 300))
    vocab = int(rng.integers(8, 120))
    n_labels = int(rng.integers(3, 80))
    k = int(rng.integers(1, n_labels + 1))
    fused = bool(rng.integers(2))
    w_order = ("R", "C")[rng.integers(2)]
    label_blk = int(rng.integers(1, n_labels + 1))
    ctx.config.max_nnzs = int(rng.choice([128, 1024, 1 << 20]))

    a_sp = sps.random(docs, vocab, density=float(rng.uniform(0.01, 0.2)),
                      format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(case))
    w_np = rng.standard_normal((n_labels, vocab)).astype(np.float32)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    if w_order == "R":
        W = flash_empty((n_labels, vocab), np.float32, ctx=ctx)
        W.write_all(w_np)
    else:
        W = flash_empty((vocab, n_labels), np.float32, order="C", ctx=ctx)
        W.write_all(w_np.T)
    s, l = xml_rank(A, W, k, label_blk=label_blk, fused=fused, ctx=ctx)
    want = (a_sp @ w_np.T).astype(np.float32)
    got_s, got_l = s.read_all(), l.read_all()
    want_sorted = -np.sort(-want, axis=1)[:, :k]
    tag = (f"case {case}: docs{docs} vocab{vocab} L{n_labels} k{k} "
           f"fused{fused} {w_order} lb{label_blk}")
    np.testing.assert_allclose(got_s, want_sorted, rtol=2e-4, atol=1e-4,
                               err_msg=tag)
    rows = np.arange(docs)[:, None]
    np.testing.assert_allclose(want[rows, got_l], got_s, rtol=2e-4,
                               atol=1e-4, err_msg=tag)


@pytest.mark.parametrize("case", range(_N or 6))
def test_csrmm_fp64_fuzz(case, ctx):
    """FP_DOUBLE_PRECISION csrmm fuzz: random shapes/layouts/transposes
    with fp64 values spanning many decades must match scipy fp64 at
    near-machine tolerance regardless of the resolved placement (fp64
    always lands on the exact host path, sparse/csrmm.py:149-159)."""
    import scipy.sparse as sps
    rng = np.random.default_rng(7000 + case)
    m = int(rng.integers(10, 300))
    k = int(rng.integers(10, 250))
    n = int(rng.integers(2, 60))
    density = float(rng.uniform(0.01, 0.15))
    alpha = float(rng.uniform(-2, 2))
    beta = float(rng.choice([0.0, rng.uniform(-1, 1)]))
    transa = "T" if rng.integers(2) else "N"
    order_b = ("R", "C")[rng.integers(2)]
    ctx.config.max_nnzs = int(rng.choice([256, 1 << 20]))
    ctx.config.sparse_compute = str(rng.choice(["host", "device", "auto"]))

    a_sp = sps.random(m, k, density=density, format="csr",
                      dtype=np.float64,
                      random_state=np.random.RandomState(case))
    # widen the magnitude range: fp32 would lose these outright
    a_sp.data *= np.exp(rng.uniform(-30, 30, a_sp.nnz))
    A = CsrFlashMatrix.from_scipy(a_sp, val_dtype=np.float64, ctx=ctx)
    out_rows = k if transa == "T" else m
    b_rows = m if transa == "T" else k
    b_np = rng.standard_normal((b_rows, n))
    c_np = rng.standard_normal((out_rows, n))
    B = mem_array((b_rows, n), np.float64, order=order_b, data=b_np,
                  ctx=ctx)
    C = mem_array((out_rows, n), np.float64, data=c_np, ctx=ctx)
    csrmm(A, B, C, alpha=alpha, beta=beta, transa=transa, ctx=ctx)
    opa = a_sp.T if transa == "T" else a_sp
    want = alpha * (opa @ b_np) + beta * c_np
    got = C.read_all()
    denom = np.maximum(np.abs(want).max(), 1e-300)
    assert float(np.abs(got - want).max()) / denom < 1e-12, (
        f"case {case}: m{m} k{k} n{n} ta{transa} ob{order_b} "
        f"a{alpha:.3f} b{beta:.3f}")


@pytest.mark.parametrize("case", range(_N or 5))
def test_kmeans_fp64_fuzz(case, ctx):
    """fp64 Lloyd-step fuzz: random shapes/blockings vs the pure-fp64
    partial-distance golden, exact labels and near-machine centers."""
    from bof_tpu.ops.kmeans import lloyds_iter
    rng = np.random.default_rng(8000 + case)
    n = int(rng.integers(50, 2000))
    d = int(rng.integers(2, 24))
    kk = int(rng.integers(2, 9))
    blk = int(rng.integers(16, max(17, n)))
    pts = rng.standard_normal((n, d)) * np.exp(rng.uniform(-5, 5))
    P = mem_array((n, d), np.float64, data=pts, ctx=ctx)
    c0 = pts[rng.choice(n, kk, replace=False)]
    got_c, got_i, counts = lloyds_iter(P, c0, blk_rows=blk, ctx=ctx)
    g = pts @ c0.T
    pd = (c0 * c0).sum(1)[None, :] - 2.0 * g
    labels = pd.argmin(1)
    want_c = np.stack([pts[labels == c].mean(0) if (labels == c).any()
                       else c0[c] for c in range(kk)])
    # rtol 1e-12: block-partitioned fp64 accumulation reorders sums vs
    # the golden's single-pass mean (deep-sweep case 48 hit 2.9e-13 on a
    # near-zero coordinate with exp(5)-scale spread)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-12, atol=0,
                               err_msg=f"case {case} n{n} d{d} k{kk}")
    assert counts.sum() == n


@pytest.mark.parametrize("case", range(_N or 12))
def test_hostpar_fuzz(case, monkeypatch):
    """Randomized shard counts / sizes / dtypes / duplicate densities for
    the parallel host phase bodies (merge-path run merges + counting
    argsort): the shard boundaries and co-rank splits are where the bugs
    live, and every case checks against the numpy golden."""
    rng = np.random.default_rng(7000 + case)
    monkeypatch.setenv("BOF_HOST_THREADS", str(int(rng.integers(2, 11))))
    from bof_tpu.io.native import counting_argsort_i32, load_library
    from bof_tpu.utils.hostpar import parallel_sort
    if load_library() is None:
        pytest.skip("native engine unavailable")

    n = int(rng.integers(1, 200_000))
    dt = rng.choice([np.float32, np.float64, np.int32, np.int64,
                     np.uint16, np.int8])
    if np.dtype(dt).kind == "f":
        # mix wide range, duplicates, and (sometimes) NaN/inf
        x = rng.standard_normal(n) * 10.0 ** rng.integers(-20, 20)
        if rng.random() < 0.5 and n > 4:
            x[rng.integers(0, n, n // 4)] = rng.choice(
                [np.nan, np.inf, -np.inf, 0.0])
        x = x.astype(dt)
    else:
        hi = int(rng.integers(2, 1 << 14))  # duplicate-heavy
        x = rng.integers(0, hi, n).astype(dt)
    want = np.sort(x.copy())
    parallel_sort(x)
    if np.dtype(dt).kind == "f":
        np.testing.assert_array_equal(np.isnan(x), np.isnan(want))
        m = ~np.isnan(x)
        np.testing.assert_array_equal(x[m], want[m])
    else:
        np.testing.assert_array_equal(x, want)

    k = int(rng.integers(1, 5000))
    keys = rng.integers(0, k, int(rng.integers(0, 100_000))).astype(np.int32)
    got = counting_argsort_i32(keys, k)
    assert got is not None
    np.testing.assert_array_equal(got, np.argsort(keys, kind="stable"))
