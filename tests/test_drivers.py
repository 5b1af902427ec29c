"""CLI driver smoke tests (the reference's driver layer is its public
surface; every driver must parse, run a small problem, and verify)."""
import os
import subprocess
import sys

import numpy as np
import pytest


def run_driver(mod, *args, check=True):
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-m", f"bof_tpu.drivers.{mod}"]
                       + [str(a) for a in args],
                       capture_output=True, text=True, env=env, timeout=600)
    if check and r.returncode != 0:
        raise AssertionError(f"{mod} failed:\n{r.stdout}\n{r.stderr}")
    return r


@pytest.fixture
def scratch(tmp_path):
    d = tmp_path / "scratch"
    d.mkdir()
    return str(d)


def test_dense_create_and_gemm_driver(tmp_path, scratch):
    m = n = k = 96
    a, b, c = (str(tmp_path / x) for x in "abc")
    run_driver("dense_create", a, m, k, "--fill", "random")
    run_driver("dense_create", b, k, n, "--fill", "random", "--seed", 1)
    r = run_driver("gemm", a, b, c, m, n, k, "--create-c", "--blk", 32,
                   "--scratch", scratch)
    assert "checksum" in r.stdout
    got = np.fromfile(c, np.float32).reshape(m, n)
    a_np = np.fromfile(a, np.float32).reshape(m, k)
    b_np = np.fromfile(b, np.float32).reshape(k, n)
    np.testing.assert_allclose(got, a_np @ b_np, rtol=2e-4, atol=1e-4)
    # journaled run through the CLI: completes, removes its journal,
    # and --resume-journal + --sharded is a usage error
    jp = str(tmp_path / "journal.txt")
    run_driver("gemm", a, b, c, m, n, k, "--blk", 32, "--scratch",
               scratch, "--resume-journal", jp)
    assert not os.path.exists(jp)
    r = run_driver("gemm", a, b, c, m, n, k, "--blk", 32, "--scratch",
                   scratch, "--resume-journal", jp, "--sharded",
                   check=False)
    assert r.returncode != 0 and "single-chip" in r.stderr


def test_sparse_create_and_csrmm_driver(tmp_path, scratch):
    m, k, n = 200, 150, 16
    prefix = str(tmp_path / "A")
    run_driver("sparse_create", prefix, m, k, 3.0)
    b = str(tmp_path / "b")
    c = str(tmp_path / "c")
    run_driver("dense_create", b, k, n)
    r = run_driver("csrmm", prefix, m, k, b, n, c, "--create-c",
                   "--scratch", scratch)
    assert "checksum" in r.stdout
    # verify against in-mem baseline driver
    c2 = str(tmp_path / "c2")
    run_driver("in_mem_sparse", "csrmm", prefix, m, k, b, n, c2)
    np.testing.assert_allclose(np.fromfile(c, np.float32),
                               np.fromfile(c2, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_csrgemv_and_csrcsc_drivers(tmp_path, scratch):
    m, k = 180, 120
    prefix = str(tmp_path / "A")
    run_driver("sparse_create", prefix, m, k, 2.5)
    x = str(tmp_path / "x")
    np.random.default_rng(0).standard_normal(k).astype(
        np.float32).tofile(x)
    y = str(tmp_path / "y")
    run_driver("csrgemv", prefix, m, k, x, y, "--scratch", scratch)
    y2 = str(tmp_path / "y2")
    run_driver("in_mem_sparse", "csrgemv", prefix, m, k, x, y2)
    np.testing.assert_allclose(np.fromfile(y, np.float32),
                               np.fromfile(y2, np.float32), rtol=1e-4,
                               atol=1e-4)
    # transpose both ways and compare triplets
    t1 = str(tmp_path / "T1")
    t2 = str(tmp_path / "T2")
    run_driver("csrcsc", prefix, m, k, t1, "--scratch", scratch)
    run_driver("in_mem_sparse", "csrcsc", prefix, m, k, t2)
    for ext in (".off", ".col", ".csr"):
        np.testing.assert_array_equal(
            np.fromfile(t1 + ext, np.uint8), np.fromfile(t2 + ext, np.uint8))


def test_sort_and_map_reduce_drivers(tmp_path, scratch):
    n = 40_000
    src = str(tmp_path / "s")
    dst = str(tmp_path / "d")
    data = np.abs(np.random.default_rng(2).standard_normal(n)).astype(
        np.float32)
    data.tofile(src)
    run_driver("sort", src, dst, n, "--blk", 4096, "--scratch", scratch)
    got = np.fromfile(dst, np.float32)
    np.testing.assert_array_equal(got, np.sort(data))
    out = str(tmp_path / "m")
    r = run_driver("map_reduce", src, out, n, "--scratch", scratch)
    assert "sum" in r.stdout
    # fp64 variant: sqrt runs the exact numpy path, sum matches fp64
    src64, out64 = str(tmp_path / "s64"), str(tmp_path / "m64")
    d64 = np.abs(np.random.default_rng(3).standard_normal(n))
    d64.tofile(src64)
    r = run_driver("map_reduce", src64, out64, n, "--dtype", "float64",
                   "--scratch", scratch)
    np.testing.assert_allclose(np.fromfile(out64, np.float64),
                               np.sqrt(d64), rtol=0, atol=0)
    got_sum = float(r.stdout.split("sum ")[1].split()[0])
    # block-sequential vs numpy-pairwise fp64 accumulation order
    np.testing.assert_allclose(got_sum, np.sqrt(d64).sum(), rtol=1e-12)


def test_kmeans_driver(tmp_path, scratch):
    n, d, k = 1000, 8, 4
    pts = str(tmp_path / "p")
    np.random.default_rng(1).standard_normal((n, d)).astype(
        np.float32).tofile(pts)
    r = run_driver("kmeans", pts, n, d, k, "--iters", 2,
                   "--scratch", scratch)
    assert "inertia" in r.stdout
    # fp64 points through the same CLI (exact host Lloyd step)
    pts64 = str(tmp_path / "p64")
    np.random.default_rng(1).standard_normal((n, d)).tofile(pts64)
    r = run_driver("kmeans", pts64, n, d, k, "--iters", 2,
                   "--dtype", "float64", "--scratch", scratch)
    assert "inertia" in r.stdout


def test_file_handle_test_driver(scratch):
    r = run_driver("file_handle_test", "--trials", 60, "--elems", 1 << 16,
                   "--scratch", scratch)
    assert "PASS" in r.stdout


def test_gemm_run_harness(scratch):
    r = run_driver("gemm_run", "--m", 96, "--n", 64, "--k", 80,
                   "--blk", 32, "--scratch", scratch)
    assert "ALL PASS" in r.stdout


def test_gemm_run_harness_fp64_ld(scratch):
    """All 8 configs through the sliced fp64 path with ld-padded operand
    files — near machine-eps (the harness analog of the reference's
    gemm_run.sh, extended to FP_DOUBLE_PRECISION + lda)."""
    r = run_driver("gemm_run", "--m", 48, "--n", 40, "--k", 56,
                   "--blk", 16, "--dtype", "float64",
                   "--fp64-device", "sliced", "--ld-pad", 5,
                   "--scratch", scratch)
    assert "ALL PASS" in r.stdout


def test_eigensolver_driver(tmp_path, scratch):
    m, k = 150, 90
    prefix = str(tmp_path / "E")
    run_driver("sparse_create", prefix, m, k, 4.0)
    r = run_driver("eigensolver", prefix, m, k, 3, "--iters", 15,
                   "--scratch", scratch)
    assert "singular values:" in r.stdout


def test_in_mem_and_mmap_gemm_drivers(tmp_path, scratch):
    m = n = k = 64
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    run_driver("dense_create", a, m, k, "--seed", 2)
    run_driver("dense_create", b, k, n, "--seed", 3)
    a_np = np.fromfile(a, np.float32).reshape(m, k)
    b_np = np.fromfile(b, np.float32).reshape(k, n)
    want = a_np @ b_np
    c1 = str(tmp_path / "c1")
    np.zeros((m, n), np.float32).tofile(c1)
    run_driver("in_mem_gemm", a, b, c1, m, n, k)
    np.testing.assert_allclose(np.fromfile(c1, np.float32).reshape(m, n),
                               want, rtol=2e-4, atol=1e-4)
    c2 = str(tmp_path / "c2")
    np.zeros((m, n), np.float32).tofile(c2)
    run_driver("mmap_gemm", a, b, c2, m, n, k, "--blk", 32)
    np.testing.assert_allclose(np.fromfile(c2, np.float32).reshape(m, n),
                               want, rtol=2e-4, atol=1e-4)
    # fp64 twins: host dgemm paths, exact vs numpy
    a64, b64 = str(tmp_path / "a64"), str(tmp_path / "b64")
    r = np.random.default_rng(4)
    an, bn = r.standard_normal((m, k)), r.standard_normal((k, n))
    an.tofile(a64)
    bn.tofile(b64)
    c3, c4 = str(tmp_path / "c3"), str(tmp_path / "c4")
    np.zeros((m, n)).tofile(c3)
    np.zeros((m, n)).tofile(c4)
    run_driver("in_mem_gemm", a64, b64, c3, m, n, k, "--dtype", "float64")
    np.testing.assert_allclose(np.fromfile(c3).reshape(m, n), an @ bn,
                               rtol=1e-13, atol=1e-12)
    run_driver("mmap_gemm", a64, b64, c4, m, n, k, "--blk", 32,
               "--dtype", "float64")
    np.testing.assert_allclose(np.fromfile(c4).reshape(m, n), an @ bn,
                               rtol=1e-13, atol=1e-12)


def test_csrmm_pmem_and_inmem_variants(tmp_path, scratch):
    m, k, n = 120, 80, 8
    prefix = str(tmp_path / "P")
    run_driver("sparse_create", prefix, m, k, 2.0)
    b = str(tmp_path / "b")
    run_driver("dense_create", b, k, n, "--seed", 6)
    c = str(tmp_path / "c")
    r = run_driver("csrmm", prefix, m, k, b, n, c, "--pmem",
                   "--scratch", scratch)
    assert "checksum" in r.stdout
    c2 = str(tmp_path / "c2")
    run_driver("in_mem_sparse", "csrmm", prefix, m, k, b, n, c2)
    np.testing.assert_allclose(np.fromfile(c, np.float32),
                               np.fromfile(c2, np.float32), rtol=1e-4,
                               atol=1e-4)


def test_sparse_drivers_fp64(tmp_path, scratch):
    """FP_DOUBLE_PRECISION parity through the sparse CLI surface
    (reference: bof_types.h:24-42 double builds of csrmm/csrgemv/csrcsc):
    fp64 values survive create -> csrmm/csrgemv/csrcsc exactly, verified
    against the fp64 scipy baselines at fp64-tight tolerance."""
    m, k, n = 150, 90, 8
    prefix = str(tmp_path / "D")
    run_driver("sparse_create", prefix, m, k, 2.5, "--dtype", "float64")
    assert (np.fromfile(prefix + ".csr", np.float64).size
            == int(np.fromfile(prefix + ".off", np.int64)[-1]))
    b = str(tmp_path / "b")
    run_driver("dense_create", b, k, n, "--dtype", "float64", "--seed", 3)
    c, c2 = str(tmp_path / "c"), str(tmp_path / "c2")
    run_driver("csrmm", prefix, m, k, b, n, c, "--dtype", "float64",
               "--create-c", "--scratch", scratch)
    run_driver("in_mem_sparse", "csrmm", prefix, m, k, b, n, c2,
               "--dtype", "float64")
    np.testing.assert_allclose(np.fromfile(c, np.float64),
                               np.fromfile(c2, np.float64),
                               rtol=1e-12, atol=1e-12)
    x, y, y2 = (str(tmp_path / s) for s in ("x", "y", "y2"))
    np.random.default_rng(0).standard_normal(k).tofile(x)
    run_driver("csrgemv", prefix, m, k, x, y, "--dtype", "float64",
               "--scratch", scratch)
    run_driver("in_mem_sparse", "csrgemv", prefix, m, k, x, y2,
               "--dtype", "float64")
    np.testing.assert_allclose(np.fromfile(y, np.float64),
                               np.fromfile(y2, np.float64),
                               rtol=1e-12, atol=1e-12)
    t1, t2 = str(tmp_path / "T1"), str(tmp_path / "T2")
    run_driver("csrcsc", prefix, m, k, t1, "--dtype", "float64",
               "--scratch", scratch)
    run_driver("in_mem_sparse", "csrcsc", prefix, m, k, t2,
               "--dtype", "float64")
    for ext in (".off", ".col", ".csr"):
        np.testing.assert_array_equal(
            np.fromfile(t1 + ext), np.fromfile(t2 + ext))


def test_sort_and_kmeans_in_mem_baselines(tmp_path, scratch):
    n = 10_000
    src = str(tmp_path / "s")
    data = np.random.default_rng(7).standard_normal(n).astype(np.float32)
    data.tofile(src)
    dst = str(tmp_path / "d")
    run_driver("sort", src, dst, n, "--in-mem")
    np.testing.assert_array_equal(np.fromfile(dst, np.float32),
                                  np.sort(data))
    pts = str(tmp_path / "p")
    np.random.default_rng(8).standard_normal((500, 4)).astype(
        np.float32).tofile(pts)
    r = run_driver("kmeans", pts, 500, 4, 3, "--iters", 2, "--in-mem")
    assert "inertia" in r.stdout


def test_topic_model_driver(tmp_path, scratch):
    m, k = 300, 90
    prefix = str(tmp_path / "TM")
    run_driver("sparse_create", prefix, m, k, 8.0)
    r = run_driver("topic_model", prefix, m, k, 3, "--proj-dim", 16,
                   "--iters", 3, "--scratch", scratch)
    assert "topics (3," in r.stdout


def test_sharded_driver_flags(tmp_path, rng):
    """--sharded on the gemm/csrmm/kmeans CLIs runs the mesh path over
    whatever devices exist (8 virtual CPU devices here)."""
    import scipy.sparse as sps
    from bof_tpu.drivers import csrmm as csrmm_drv
    from bof_tpu.drivers import gemm as gemm_drv
    from bof_tpu.drivers import kmeans as kmeans_drv

    n = 96
    a = rng.standard_normal((n, n)).astype(np.float32)
    b = rng.standard_normal((n, n)).astype(np.float32)
    (tmp_path / "A.bin").write_bytes(a.tobytes())
    (tmp_path / "B.bin").write_bytes(b.tobytes())
    gemm_drv.main([str(tmp_path / "A.bin"), str(tmp_path / "B.bin"),
                   str(tmp_path / "C.bin"), str(n), str(n), str(n),
                   "--blk", "48", "--create-c", "--sharded",
                   "--scratch", str(tmp_path / "s1")])
    got = np.fromfile(tmp_path / "C.bin", np.float32).reshape(n, n)
    np.testing.assert_allclose(got, a @ b, rtol=2e-4, atol=1e-3)

    sp = sps.random(200, 80, density=0.08, format="csr", dtype=np.float32,
                    random_state=np.random.RandomState(2))
    from bof_tpu.sparse.csr import CsrFlashMatrix
    from bof_tpu import FlashConfig, FlashContext
    ctx = FlashContext(FlashConfig(scratch_dir=str(tmp_path / "mk")))
    CsrFlashMatrix.from_scipy(sp, backing="file",
                              path_prefix=str(tmp_path / "S"), ctx=ctx)
    ctx.destroy()
    bmat = rng.standard_normal((80, 16)).astype(np.float32)
    (tmp_path / "Bs.bin").write_bytes(bmat.tobytes())
    csrmm_drv.main([str(tmp_path / "S"), "200", "80",
                    str(tmp_path / "Bs.bin"), "16",
                    str(tmp_path / "Cs.bin"), "--create-c", "--sharded",
                    "--scratch", str(tmp_path / "s2")])
    got = np.fromfile(tmp_path / "Cs.bin", np.float32).reshape(200, 16)
    np.testing.assert_allclose(got, sp @ bmat, rtol=2e-4, atol=1e-4)

    pts = np.concatenate([rng.standard_normal((80, 4)).astype(np.float32)
                          + 8 * i for i in range(3)])
    (tmp_path / "P.bin").write_bytes(pts.tobytes())
    kmeans_drv.main([str(tmp_path / "P.bin"), "240", "4", "3",
                     "--iters", "6", "--sharded",
                     "--scratch", str(tmp_path / "s3")])


def test_xml_rank_driver(tmp_path, scratch):
    docs, vocab, n_labels, k = 120, 64, 20, 5
    prefix = str(tmp_path / "A")
    w = str(tmp_path / "W")
    run_driver("sparse_create", prefix, docs, vocab, 4.0)
    run_driver("dense_create", w, n_labels, vocab, "--fill", "random")
    s_path, l_path = str(tmp_path / "S"), str(tmp_path / "L")
    r = run_driver("xml_rank", prefix, docs, vocab, w, n_labels, k,
                   "--scores", s_path, "--labels", l_path,
                   "--scratch", scratch)
    assert "checksum" in r.stdout
    # differential check vs dense numpy top-k
    import scipy.sparse as sps
    ia = np.fromfile(prefix + ".off", np.int64)
    ja = np.fromfile(prefix + ".col", np.int64)
    va = np.fromfile(prefix + ".csr", np.float32)
    a_sp = sps.csr_matrix((va, ja, ia), shape=(docs, vocab))
    w_np = np.fromfile(w, np.float32).reshape(n_labels, vocab)
    want = (a_sp @ w_np.T).astype(np.float32)
    got_s = np.fromfile(s_path, np.float32).reshape(docs, k)
    got_l = np.fromfile(l_path, np.int32).reshape(docs, k)
    np.testing.assert_allclose(got_s, -np.sort(-want, axis=1)[:, :k],
                               rtol=2e-4, atol=1e-4)
    rows = np.arange(docs)[:, None]
    np.testing.assert_allclose(want[rows, got_l], got_s,
                               rtol=2e-4, atol=1e-4)


def test_repack_and_tiled_gemm_driver(tmp_path, scratch):
    """repack CLI converts flat<->tiled; gemm --tile matches the flat run
    (core/tiled_array.py; extension — reference files are always flat,
    misc/dense_create.cpp)."""
    m, n, k, ts = 96, 80, 88, 32
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    at, bt, ct = (str(tmp_path / x) for x in ("at", "bt", "ct"))
    run_driver("dense_create", a, m, k, "--fill", "random")
    run_driver("dense_create", b, k, n, "--fill", "random", "--seed", 1)
    r = run_driver("repack", a, at, m, k, "--tile", ts,
                   "--scratch", scratch, "--verify")
    assert "OK" in r.stdout
    run_driver("repack", b, bt, k, n, "--tile", ts, "--scratch", scratch)
    r = run_driver("gemm", at, bt, ct, m, n, k, "--tile", ts,
                   "--create-c", "--scratch", scratch)
    assert "checksum" in r.stdout
    # unpack the tiled C and compare against the numpy golden
    cf = str(tmp_path / "cf")
    run_driver("repack", cf, ct, m, n, "--tile", ts, "--scratch", scratch,
               "--unpack")
    got = np.fromfile(cf, np.float32).reshape(m, n)
    a_np = np.fromfile(a, np.float32).reshape(m, k)
    b_np = np.fromfile(b, np.float32).reshape(k, n)
    np.testing.assert_allclose(got, a_np @ b_np, rtol=2e-4, atol=1e-4)


def test_gemm_driver_lda(tmp_path, scratch):
    """ld-padded sub-matrices through the CLI (reference drivers/gemm.cpp
    takes lda_a/lda_b/lda_c positionally; here --lda/--ldb/--ldc)."""
    m, n, k = 48, 40, 56
    lda, ldb, ldc = 64, 72, 50
    rng = np.random.default_rng(9)
    a_full = rng.standard_normal((m, lda)).astype(np.float32)
    b_full = rng.standard_normal((k, ldb)).astype(np.float32)
    c_full = np.zeros((m, ldc), np.float32)
    a, b, c = (str(tmp_path / x) for x in "abc")
    a_full.tofile(a); b_full.tofile(b); c_full.tofile(c)
    run_driver("gemm", a, b, c, m, n, k, "--blk", 32,
               "--lda", lda, "--ldb", ldb, "--ldc", ldc,
               "--scratch", scratch)
    got = np.fromfile(c, np.float32).reshape(m, ldc)
    want = a_full[:, :k] @ b_full[:, :n]
    np.testing.assert_allclose(got[:, :n], want, rtol=2e-4, atol=1e-4)
    # bytes beyond the logical width are the pad, untouched by the kernel
    np.testing.assert_array_equal(got[:, n:], 0.0)
