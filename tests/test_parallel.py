"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest


def need_devices(n):
    import jax
    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices, have {len(jax.devices())}")


def test_sharded_accum_step_matches_dense():
    import jax
    import jax.numpy as jnp
    from bof_tpu.parallel import make_mesh, sharded_accum_step

    need_devices(8)
    mesh = make_mesh(8)
    px, py = mesh.devices.shape
    step = sharded_accum_step(mesh)
    rng = np.random.default_rng(0)
    bm = bk = bn = 16 * px * py
    a = rng.standard_normal((bm, bk)).astype(np.float32)
    b = rng.standard_normal((bk, bn)).astype(np.float32)
    c = rng.standard_normal((bm, bn)).astype(np.float32)
    got = np.asarray(step(jnp.asarray(c), jnp.asarray(a), jnp.asarray(b),
                          np.float32(2.0)))
    want = c + 2.0 * (a.astype(np.float64) @ b.astype(np.float64))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-4,
                               atol=1e-4)


def test_gemm_sharded_out_of_core(ctx, rng, tmp_path):
    from bof_tpu import map_array
    from bof_tpu.parallel import gemm_sharded, make_mesh

    need_devices(8)
    mesh = make_mesh(8)
    m, n, k = 96, 80, 112
    a_np = rng.standard_normal((m, k)).astype(np.float32)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    A = map_array(str(tmp_path / "A"), (m, k), np.float32, create=True,
                  ctx=ctx)
    B = map_array(str(tmp_path / "B"), (k, n), np.float32, create=True,
                  ctx=ctx)
    C = map_array(str(tmp_path / "C"), (m, n), np.float32, create=True,
                  ctx=ctx)
    A.write_all(a_np)
    B.write_all(b_np)
    gemm_sharded(A, B, C, blk=32, mesh=mesh, ctx=ctx)
    want = (a_np.astype(np.float64) @ b_np.astype(np.float64)).astype(
        np.float32)
    np.testing.assert_allclose(C.read_all(), want, rtol=2e-4, atol=1e-4)


def test_mesh_shapes():
    from bof_tpu.parallel import make_mesh
    need_devices(8)
    mesh = make_mesh(8)
    assert int(np.prod(mesh.devices.shape)) == 8
    assert mesh.axis_names == ("x", "y")
    mesh6 = make_mesh(6)
    assert int(np.prod(mesh6.devices.shape)) == 6


def test_dp_lloyd_matches_single_device(ctx, rng):
    from bof_tpu.ops.kmeans import kmeans_in_mem
    from bof_tpu.parallel import lloyds_iter_sharded, make_mesh

    need_devices(8)
    mesh = make_mesh(8)
    n, d, k = 1003, 16, 5  # deliberately not divisible by 8
    pts = rng.standard_normal((n, d)).astype(np.float32)
    c0 = pts[:k].copy()
    got_c, got_inertia, counts = lloyds_iter_sharded(pts, c0, mesh=mesh)
    want_c, want_inertia = kmeans_in_mem(pts, c0, n_iters=1)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_inertia, want_inertia, rtol=1e-3)
    assert counts.sum() == n


@pytest.mark.parametrize("order,ta,tb",
                         [("R", "N", "N"), ("R", "T", "N"),
                          ("C", "N", "T"), ("C", "T", "T")])
def test_gemm_sharded_all_layouts(ctx, rng, tmp_path, order, ta, tb):
    from bof_tpu import map_array
    from bof_tpu.parallel import gemm_sharded, make_mesh

    need_devices(8)
    mesh = make_mesh(8)
    m, n, k = 96, 80, 112
    a_shape = (k, m) if ta == "T" else (m, k)
    b_shape = (n, k) if tb == "T" else (k, n)
    a_np = rng.standard_normal(a_shape).astype(np.float32)
    b_np = rng.standard_normal(b_shape).astype(np.float32)
    A = map_array(str(tmp_path / "A"), a_shape, np.float32, order,
                  create=True, ctx=ctx)
    B = map_array(str(tmp_path / "B"), b_shape, np.float32, order,
                  create=True, ctx=ctx)
    C = map_array(str(tmp_path / "C"), (m, n), np.float32, order,
                  create=True, ctx=ctx)
    A.write_all(a_np)
    B.write_all(b_np)
    gemm_sharded(A, B, C, transa=ta, transb=tb, blk=32, mesh=mesh, ctx=ctx)
    opa = a_np.T if ta == "T" else a_np
    opb = b_np.T if tb == "T" else b_np
    want = (opa.astype(np.float64) @ opb.astype(np.float64)).astype(
        np.float32)
    np.testing.assert_allclose(C.read_all(), want, rtol=2e-4, atol=1e-4)


def test_csrmm_sharded_matches_scipy(ctx, rng):
    """Row-sharded sparse x dense over the 8-device mesh vs scipy."""
    import scipy.sparse as sps
    from bof_tpu.parallel import csrmm_sharded, make_mesh
    from bof_tpu.sparse import CsrFlashMatrix
    from bof_tpu import mem_array

    ctx.config.max_nnzs = 4096  # several row blocks
    m, k, n = 500, 200, 48
    a_sp = sps.random(m, k, density=0.05, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(5))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    c0_np = rng.standard_normal((m, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, data=b_np, ctx=ctx)
    C = mem_array((m, n), np.float32, data=c0_np, ctx=ctx)
    mesh = make_mesh(8)
    csrmm_sharded(A, B, C, alpha=2.0, beta=0.5, mesh=mesh, ctx=ctx)
    want = 2.0 * (a_sp @ b_np) + 0.5 * c0_np
    np.testing.assert_allclose(C.read_all(), want, rtol=2e-4, atol=1e-4)


def test_lloyds_iter_ooc_sharded_matches_single_chip(ctx, rng):
    """Streamed flash-resident points through the DP Lloyd step must match
    the single-chip lloyds_iter exactly (same statistics, same labels)."""
    from bof_tpu import flash_empty, mem_array
    from bof_tpu.ops.kmeans import lloyds_iter
    from bof_tpu.parallel import lloyds_iter_ooc_sharded, make_mesh

    n, d, kc = 437, 12, 5  # ragged vs both the block and the mesh
    pts = rng.standard_normal((n, d)).astype(np.float32)
    c0 = pts[rng.choice(n, kc, replace=False)].copy()
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    lab_a = flash_empty((n,), np.int32, ctx=ctx)
    lab_b = flash_empty((n,), np.int32, ctx=ctx)
    mesh = make_mesh(8)
    want_c, want_i, want_n = lloyds_iter(P, c0, labels_out=lab_a,
                                         blk_rows=64, ctx=ctx)
    got_c, got_i, got_n = lloyds_iter_ooc_sharded(
        P, c0, labels_out=lab_b, mesh=mesh, blk_rows=64, ctx=ctx)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_n, want_n)
    assert abs(got_i - want_i) < 1e-2 * max(abs(want_i), 1.0)
    np.testing.assert_array_equal(lab_b.read_all(), lab_a.read_all())


def test_kmeans_fit_sharded_converges(ctx, rng):
    from bof_tpu import flash_empty, mem_array
    from bof_tpu.parallel import kmeans_fit_sharded, make_mesh
    # three well-separated blobs
    blobs = [rng.standard_normal((100, 4)).astype(np.float32) + 10 * i
             for i in range(3)]
    pts = np.concatenate(blobs)
    rng.shuffle(pts)
    P = mem_array((300, 4), np.float32, data=pts, ctx=ctx)
    labels = flash_empty((300,), np.int32, ctx=ctx)
    centers, inertia = kmeans_fit_sharded(P, 3, n_iters=8, seed=1,
                                          labels_out=labels,
                                          mesh=make_mesh(8), ctx=ctx)
    # each blob center recovered (within noise)
    got = np.sort(centers.mean(axis=1))
    want = np.sort([b.mean() for b in blobs])
    np.testing.assert_allclose(got, want, atol=0.5)
    lab = labels.read_all()
    assert set(np.unique(lab)) <= {0, 1, 2} and len(np.unique(lab)) == 3


def test_gemm_sharded_pin_failure_raises_not_hangs(ctx, rng):
    """A pin failure in the producer (tile over the program budget) must
    surface as an exception from gemm_sharded, not a silent hang."""
    from bof_tpu import FlashConfig, FlashContext, mem_array
    from bof_tpu.parallel import gemm_sharded, make_mesh
    import bof_tpu
    small = FlashContext(FlashConfig(scratch_dir=ctx.config.scratch_dir,
                                     program_budget=1 << 10))  # 1 KiB
    try:
        n = 64
        A = mem_array((n, n), np.float32,
                      data=rng.standard_normal((n, n)).astype(np.float32),
                      ctx=small)
        B = mem_array((n, n), np.float32,
                      data=rng.standard_normal((n, n)).astype(np.float32),
                      ctx=small)
        C = mem_array((n, n), np.float32, ctx=small)
        with pytest.raises(MemoryError):
            gemm_sharded(A, B, C, blk=64, mesh=make_mesh(8), ctx=small)
    finally:
        small.destroy()


@pytest.mark.parametrize("fused", [True, False])
def test_xml_rank_sharded_matches_single_chip(ctx, rng, fused):
    """xml_rank(mesh=...) — the scoring pass row-sharded over the mesh,
    on both the fused sharded top_k step and the csrmm_sharded
    composition — must equal the dense golden top-k."""
    import scipy.sparse as sps
    from bof_tpu.apps import xml_rank
    from bof_tpu.core.flash_array import flash_empty
    from bof_tpu.parallel import make_mesh
    from bof_tpu.sparse import CsrFlashMatrix
    docs, vocab, n_labels, k = 96, 48, 25, 4
    a_sp = sps.random(docs, vocab, density=0.12, format="csr",
                      dtype=np.float32, random_state=np.random.RandomState(8))
    w_np = rng.standard_normal((n_labels, vocab)).astype(np.float32)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    W = flash_empty((n_labels, vocab), np.float32, ctx=ctx)
    W.write_all(w_np)
    s, l = xml_rank(A, W, k, label_blk=9, fused=fused, mesh=make_mesh(8),
                    ctx=ctx)
    want = (a_sp @ w_np.T).astype(np.float32)
    want_sorted = -np.sort(-want, axis=1)[:, :k]
    np.testing.assert_allclose(s.read_all(), want_sorted,
                               rtol=2e-4, atol=1e-4)
    rows = np.arange(docs)[:, None]
    np.testing.assert_allclose(want[rows, l.read_all()], s.read_all(),
                               rtol=2e-4, atol=1e-4)


def test_lanczos_sharded_matches_scipy(ctx, rng):
    """block_lanczos_svd(mesh=...): every operator application sharded."""
    import scipy.sparse as sps
    import scipy.sparse.linalg as spla
    from bof_tpu.apps import block_lanczos_svd
    from bof_tpu.parallel import make_mesh
    from bof_tpu.sparse import CsrFlashMatrix
    ctx.config.max_nnzs = 2048
    m, k, L = 200, 90, 4
    a_sp = sps.random(m, k, density=0.06, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(4))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    sigma, v = block_lanczos_svd(A, L, tol=1e-9, mesh=make_mesh(8), ctx=ctx)
    want = np.sort(spla.svds(a_sp.astype(np.float64), k=L,
                             return_singular_vectors=False))[::-1]
    np.testing.assert_allclose(sigma, want, rtol=1e-3)


def test_topic_model_sharded_recovers_topics(ctx):
    """topic_model(mesh=...): projection + Lloyd steps over the mesh."""
    import scipy.sparse as sps
    from bof_tpu.apps import topic_model
    from bof_tpu.parallel import make_mesh
    from bof_tpu.sparse import CsrFlashMatrix
    n_topics, docs_per, vocab_per = 3, 80, 30
    docs, vocab = n_topics * docs_per, n_topics * vocab_per
    rows, cols = [], []
    rs = np.random.RandomState(2)
    for t in range(n_topics):
        for d in range(docs_per):
            for w in t * vocab_per + rs.randint(0, vocab_per, 12):
                rows.append(t * docs_per + d)
                cols.append(w)
    A_sp = sps.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                          shape=(docs, vocab))
    A_sp.sum_duplicates()
    ctx.config.max_nnzs = 2048
    A = CsrFlashMatrix.from_scipy(A_sp, ctx=ctx)
    tw, labels = topic_model(A, n_topics, proj_dim=16, n_iters=8,
                             mesh=make_mesh(8), ctx=ctx)
    purity = sum(np.bincount(labels[t * docs_per:(t + 1) * docs_per],
                             minlength=n_topics).max()
                 for t in range(n_topics))
    assert purity / docs > 0.9


def test_gemm_sharded_b_tile_hbm_reuse(ctx, rng):
    """With j-outer/i-middle/l-inner step order, the B superblock (l, j)
    must be uploaded once per j and served from the device LRU for the
    remaining i sweeps — (mB-1)*kB hits on an mB x nB x kB grid."""
    from bof_tpu import mem_array
    from bof_tpu.parallel import gemm_sharded, make_mesh
    from bof_tpu.utils import METRICS
    n = 96  # 3x3x3 superblock grid at blk=32
    a_np = rng.standard_normal((n, n)).astype(np.float32)
    b_np = rng.standard_normal((n, n)).astype(np.float32)
    A = mem_array((n, n), np.float32, data=a_np, ctx=ctx)
    B = mem_array((n, n), np.float32, data=b_np, ctx=ctx)
    C = mem_array((n, n), np.float32, ctx=ctx)
    before = METRICS.get("gemm_sharded.b_hbm_hits")
    gemm_sharded(A, B, C, blk=32, mesh=make_mesh(8), ctx=ctx)
    hits = METRICS.get("gemm_sharded.b_hbm_hits") - before
    assert hits == (3 - 1) * 3 * 3, hits  # (mB-1) * kB * nB
    np.testing.assert_allclose(
        C.read_all(), a_np.astype(np.float64) @ b_np.astype(np.float64),
        rtol=2e-4, atol=1e-3)


def test_kmeans_fit_sharded_resident_matches_streaming(ctx, rng):
    """The mesh fit's HBM-resident path (panel sharded onto devices once)
    must match the per-pass streaming path."""
    from bof_tpu import mem_array
    from bof_tpu.parallel import kmeans_fit_sharded, make_mesh
    n, d, k = 4003, 6, 4  # non-multiple of 8 exercises shard padding
    pts = (rng.standard_normal((n, d)) * 0.05
           + rng.integers(0, k, n)[:, None]).astype(np.float32)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    lab_a = mem_array((n,), np.int32, ctx=ctx)
    lab_b = mem_array((n,), np.int32, ctx=ctx)
    mesh = make_mesh(8)
    c_a, i_a = kmeans_fit_sharded(P, k, n_iters=4, seed=2, tol=-1.0,
                                  labels_out=lab_a, mesh=mesh, ctx=ctx)
    old = ctx.config.hbm_budget
    ctx.config.hbm_budget = 1 << 6  # deny residency -> streaming
    try:
        c_b, i_b = kmeans_fit_sharded(P, k, n_iters=4, seed=2, tol=-1.0,
                                      labels_out=lab_b, mesh=mesh, ctx=ctx)
    finally:
        ctx.config.hbm_budget = old
    np.testing.assert_allclose(c_a, c_b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(i_a, i_b, rtol=1e-3)
    np.testing.assert_array_equal(lab_a.read_all(), lab_b.read_all())


def test_multihost_helpers_match_device_put(ctx, rng):
    """The multi-host data-plane helpers (addressable-shard assembly and
    per-shard write-back) must be byte-identical to the single-host
    device_put / full-block write they replace — validated on the
    8-device mesh where addressable == all devices."""
    import jax

    from bof_tpu import mem_array
    from bof_tpu.parallel import make_mesh
    from bof_tpu.parallel.mesh import (_put_addressable, _writeback_shards,
                                       sharding_for)
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(8)
    sb = 32
    x = rng.standard_normal((sb, sb)).astype(np.float32)
    for spec in (P("x", "y"), P("y", None), P(None, "y"), P()):
        sh = sharding_for(mesh, spec)
        a = _put_addressable(x, sh)
        b = jax.device_put(x, sh)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding.is_equivalent_to(b.sharding, 2)

    # per-shard write-back reassembles the exact tile, both C orders,
    # including ragged tails (bi/bj < sb)
    for order in ("R", "C"):
        C = mem_array((70, 50), np.float32, order=order, ctx=ctx)
        sh_c = sharding_for(mesh, P("x", "y") if order == "R"
                            else P("y", "x"))
        tile = rng.standard_normal((sb, sb)).astype(np.float32)
        c_dev = jax.device_put(tile, sh_c)
        i0, j0, bi, bj = 16, 16, 30, 20  # ragged: clipped on both axes
        for t in _writeback_shards(c_dev, C, i0, j0, bi, bj, sb):
            t.wait()
        got = C.read_block(i0, bi, j0, bj)
        want = tile[:bi, :bj] if order == "R" else tile[:bj, :bi].T
        np.testing.assert_array_equal(got, want)


def test_gemm_sharded_sharded_reads_match(ctx, rng, tmp_path):
    """The multi-host sharded-read producer (per-shard StrideInfo
    sub-accesses) must produce byte-identical results to the whole-tile
    path, across layouts and ragged tails."""
    from bof_tpu import map_array
    from bof_tpu.parallel import gemm_sharded, make_mesh
    import bof_tpu.parallel.mesh as meshmod

    mesh = make_mesh(8)
    # 90/70/100: ragged vs blk=32 on every axis (strided accesses);
    # 32/32/32 exercises CONTIGUOUS whole-tile accesses (n_strides==1),
    # whose line stride must be derived from the storage shape
    for m, n, k in ((90, 70, 100), (32, 32, 32)):
      for order, ta, tb in (("R", "N", "N"), ("C", "T", "N"),
                            ("R", "N", "T")):
        a_shape = (k, m) if ta == "T" else (m, k)
        b_shape = (n, k) if tb == "T" else (k, n)
        a_np = rng.standard_normal(a_shape).astype(np.float32)
        b_np = rng.standard_normal(b_shape).astype(np.float32)
        A = map_array(str(tmp_path / f"A{order}{ta}{tb}"), a_shape,
                      np.float32, order, create=True, ctx=ctx)
        B = map_array(str(tmp_path / f"B{order}{ta}{tb}"), b_shape,
                      np.float32, order, create=True, ctx=ctx)
        C1 = map_array(str(tmp_path / f"C1{order}{ta}{tb}"), (m, n),
                       np.float32, order, create=True, ctx=ctx)
        C2 = map_array(str(tmp_path / f"C2{order}{ta}{tb}"), (m, n),
                       np.float32, order, create=True, ctx=ctx)
        A.write_all(a_np)
        B.write_all(b_np)
        gemm_sharded(A, B, C1, transa=ta, transb=tb, blk=32, mesh=mesh,
                     ctx=ctx)
        meshmod._FORCE_SHARDED_READS = True
        try:
            gemm_sharded(A, B, C2, transa=ta, transb=tb, blk=32, mesh=mesh,
                         ctx=ctx)
        finally:
            meshmod._FORCE_SHARDED_READS = False
        np.testing.assert_array_equal(C1.read_all(), C2.read_all())
        opa = a_np.T if ta == "T" else a_np
        opb = b_np.T if tb == "T" else b_np
        np.testing.assert_allclose(
            C2.read_all(), (opa.astype(np.float64) @ opb).astype(np.float32),
            rtol=2e-4, atol=1e-3)


def test_csrmm_sharded_sharded_reads_match(ctx, rng):
    """The multi-host sparse read path (per-shard nnz sub-reads + global
    ELL dims) must match the whole-block path exactly — including skewed
    rows, multiple ELL subranges, alpha/beta and column-major C."""
    import scipy.sparse as sps
    from bof_tpu import mem_array
    from bof_tpu.parallel import csrmm_sharded, make_mesh
    import bof_tpu.parallel.mesh as meshmod
    from bof_tpu.sparse import CsrFlashMatrix

    ctx.config.max_nnzs = 4096
    ctx.config.hbm_budget = 1 << 10  # tiny entry cap -> many subranges
    # byte-identity witnesses the READ paths: banding changes padded
    # reduction widths (low-bit fp drift), so pin it off for both runs
    ctx.config.ell_sort_rows = False
    m, k, n = 600, 150, 40
    a_sp = sps.random(m, k, density=0.04, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(9)).tolil()
    a_sp[37, :] = rng.standard_normal(k)  # mega-row skews the ELL ranges
    a_sp[411, :100] = 1.0
    a_sp = a_sp.tocsr()
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    c0_np = rng.standard_normal((m, n)).astype(np.float32)
    mesh = make_mesh(8)
    for order in ("R", "C"):
        B = mem_array((k, n), np.float32, data=b_np, ctx=ctx)
        C1 = mem_array((m, n), np.float32, order=order, data=c0_np, ctx=ctx)
        C2 = mem_array((m, n), np.float32, order=order, data=c0_np, ctx=ctx)
        csrmm_sharded(A, B, C1, alpha=1.5, beta=0.25, mesh=mesh, ctx=ctx)
        meshmod._FORCE_SHARDED_READS = True
        try:
            csrmm_sharded(A, B, C2, alpha=1.5, beta=0.25, mesh=mesh,
                          ctx=ctx)
        finally:
            meshmod._FORCE_SHARDED_READS = False
        np.testing.assert_array_equal(C1.read_all(), C2.read_all())
        want = 1.5 * (a_sp @ b_np) + 0.25 * c0_np
        np.testing.assert_allclose(C2.read_all(), want, rtol=2e-4,
                                   atol=1e-3)


def test_lloyds_ooc_sharded_reads_match(ctx, rng):
    """The kmeans multi-host read path (per-shard point-row sub-reads +
    per-device weight masks) must match the whole-block path exactly —
    statistics AND written labels, including ragged blocks/tails."""
    from bof_tpu import flash_empty, mem_array
    from bof_tpu.ops.kmeans import lloyds_iter
    from bof_tpu.parallel import lloyds_iter_ooc_sharded, make_mesh
    import bof_tpu.parallel.mesh as meshmod

    n, d, kc = 437, 12, 5
    pts = rng.standard_normal((n, d)).astype(np.float32)
    c0 = pts[rng.choice(n, kc, replace=False)].copy()
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    lab_a = flash_empty((n,), np.int32, ctx=ctx)
    lab_b = flash_empty((n,), np.int32, ctx=ctx)
    mesh = make_mesh(8)
    a = lloyds_iter_ooc_sharded(P, c0, labels_out=lab_a, mesh=mesh,
                                blk_rows=64, ctx=ctx)
    meshmod._FORCE_SHARDED_READS = True
    try:
        b = lloyds_iter_ooc_sharded(P, c0, labels_out=lab_b, mesh=mesh,
                                    blk_rows=64, ctx=ctx)
    finally:
        meshmod._FORCE_SHARDED_READS = False
    np.testing.assert_allclose(b[0], a[0], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(b[2], a[2])
    np.testing.assert_array_equal(lab_b.read_all(), lab_a.read_all())
    # and vs the single-chip golden
    want_c, _, want_n = lloyds_iter(P, c0, blk_rows=64, ctx=ctx)
    np.testing.assert_allclose(b[0], want_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(b[2], want_n)


@pytest.mark.parametrize("mode,tol", [("bfloat16", 2e-2), ("int8", 5e-2)])
def test_gemm_sharded_transfer_modes(ctx, rng, mode, tol):
    """bf16/int8 transfer modes through the sharded pipeline: quantized
    shards upload, int8 partials psum_scatter EXACTLY in int32 before
    one f32 rescale; results inside the input-rounding band."""
    from bof_tpu import mem_array
    from bof_tpu.parallel import gemm_sharded, make_mesh
    ctx.config.transfer_dtype = mode
    try:
        mesh = make_mesh(8)
        for ta, beta in (("N", 0.0), ("T", 0.5)):
            m, n, k = 96, 64, 80
            a_shape = (k, m) if ta == "T" else (m, k)
            a = rng.standard_normal(a_shape).astype(np.float32)
            b = rng.standard_normal((k, n)).astype(np.float32)
            c0 = rng.standard_normal((m, n)).astype(np.float32)
            A = mem_array(a_shape, np.float32, data=a, ctx=ctx)
            B = mem_array((k, n), np.float32, data=b, ctx=ctx)
            C = mem_array((m, n), np.float32, data=c0, ctx=ctx)
            gemm_sharded(A, B, C, alpha=1.25, beta=beta, transa=ta,
                         blk=32, mesh=mesh, ctx=ctx)
            opa = (a.T if ta == "T" else a).astype(np.float64)
            want = 1.25 * (opa @ b.astype(np.float64)) \
                + beta * c0.astype(np.float64)
            got = C.read_all().astype(np.float64)
            rel = np.abs(got - want).max() / np.abs(want).max()
            assert rel < tol, (mode, ta, rel)
            assert rel > 1e-7, "really quantized"
    finally:
        ctx.config.transfer_dtype = "float32"


def test_gemm_sharded_float64_native_mode_guarded(ctx, rng, tmp_path):
    """gemm_sharded's fp64 fall-through (fp64_device='native') must raise
    the same clear x64 error as the single-chip dispatcher instead of
    silently narrowing the sharded uploads to float32."""
    import jax
    if jax.config.jax_enable_x64:
        pytest.skip("x64 on: native fp64 is exact on the CPU mesh")
    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    from bof_tpu import mem_array
    from bof_tpu.parallel import gemm_sharded, make_mesh
    ctx.config.fp64_device = "native"
    try:
        A = mem_array((64, 48), np.float64,
                      data=rng.standard_normal((64, 48)), ctx=ctx)
        B = mem_array((48, 32), np.float64,
                      data=rng.standard_normal((48, 32)), ctx=ctx)
        C = mem_array((64, 32), np.float64, ctx=ctx)
        with pytest.raises(ValueError, match="x64"):
            gemm_sharded(A, B, C, mesh=make_mesh(8), blk=32, ctx=ctx)
    finally:
        ctx.config.fp64_device = "auto"


def test_csrmm_sharded_six_devices(ctx, rng):
    """Non-power-of-two device counts: rows_pad must divide over the
    flattened 6-device axis (min_rows = lcm(8, n_dev), not max — 8 is
    not divisible by 6 and shard_map rejects the ELL block), on both
    the whole-block and sharded-read paths."""
    import jax
    if len(jax.devices()) < 6:
        pytest.skip("need 6 devices")
    import scipy.sparse as sps
    from bof_tpu import mem_array
    import bof_tpu.parallel.mesh as meshmod
    from bof_tpu.parallel import csrmm_sharded, make_mesh
    from bof_tpu.sparse import CsrFlashMatrix

    m, k, n = 300, 90, 16
    a_sp = sps.random(m, k, density=0.05, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(3))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    mesh = make_mesh(6)
    want = (a_sp @ b_np).astype(np.float32)
    for forced in (False, True):
        B = mem_array((k, n), np.float32, data=b_np, ctx=ctx)
        C = mem_array((m, n), np.float32, ctx=ctx)
        meshmod._FORCE_SHARDED_READS = forced
        try:
            csrmm_sharded(A, B, C, mesh=mesh, ctx=ctx)
        finally:
            meshmod._FORCE_SHARDED_READS = False
        np.testing.assert_allclose(C.read_all(), want, rtol=2e-4,
                                   atol=2e-4)
