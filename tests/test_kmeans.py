"""k-means differential tests vs the in-memory golden model."""
import numpy as np

from bof_tpu import mem_array
from bof_tpu.ops.kmeans import kmeans_fit, kmeans_in_mem, lloyds_iter


def blobs(rng, n, d, k, spread=0.05):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3
    labels = rng.integers(0, k, n)
    pts = centers[labels] + spread * rng.standard_normal((n, d)).astype(
        np.float32)
    return pts.astype(np.float32), centers


def test_single_lloyd_iter_matches_golden(ctx, rng):
    n, d, k = 2000, 16, 5
    pts, _ = blobs(rng, n, d, k)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    c0 = pts[:k].copy()
    got_centers, got_inertia, counts = lloyds_iter(P, c0, blk_rows=257,
                                                   ctx=ctx)
    want_centers, want_inertia = kmeans_in_mem(pts, c0, n_iters=1)
    np.testing.assert_allclose(got_centers, want_centers, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(got_inertia, want_inertia, rtol=1e-3)
    assert counts.sum() == n


def test_labels_written(ctx, rng):
    n, d, k = 1200, 8, 4
    pts, _ = blobs(rng, n, d, k)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    L = mem_array((n,), np.int32, ctx=ctx)
    c0 = pts[:k].copy()
    lloyds_iter(P, c0, labels_out=L, blk_rows=333, ctx=ctx)
    labels = L.read_all()
    d2 = ((pts[:, None, :].astype(np.float64)
           - c0[None, :, :].astype(np.float64)) ** 2).sum(-1)
    np.testing.assert_array_equal(labels, d2.argmin(1))


def test_lloyd_converges_on_blobs(ctx, rng):
    """Iterating from perturbed true centers must converge onto them
    (random init can hit local optima — that's k-means, not the kernel)."""
    n, d, k = 3000, 10, 6
    pts, true_centers = blobs(rng, n, d, k, spread=0.02)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    centers = true_centers + 0.3 * rng.standard_normal(
        (k, d)).astype(np.float32)
    for _ in range(6):
        centers, inertia, _ = lloyds_iter(P, centers, blk_rows=500, ctx=ctx)
    d2 = ((true_centers[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    assert np.sqrt(d2.min(1)).max() < 0.05
    assert inertia / n < 0.01 * d


def test_kmeans_fit_runs_and_improves(ctx, rng):
    n, d, k = 2000, 8, 4
    pts, _ = blobs(rng, n, d, k, spread=0.05)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    c0 = pts[rng.choice(n, k, replace=False)]
    _, inertia0 = kmeans_in_mem(pts, c0, n_iters=1)
    centers, inertia = kmeans_fit(P, k, n_iters=6, seed=3, ctx=ctx)
    assert np.isfinite(inertia)
    assert inertia <= inertia0 * 1.01  # no worse than one golden step


def test_empty_cluster_keeps_center(ctx, rng):
    n, d = 100, 4
    pts = rng.standard_normal((n, d)).astype(np.float32)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    far = np.full((1, d), 1e6, np.float32)  # never assigned
    c0 = np.concatenate([pts[:2], far])
    centers, _, counts = lloyds_iter(P, c0, ctx=ctx)
    assert counts[2] == 0
    np.testing.assert_array_equal(centers[2], far[0])


def test_kmeans_fit_hbm_resident_matches_streaming(ctx, rng):
    """The HBM-resident fit (panel uploaded once) must produce identical
    centers/labels to the per-pass streaming fit."""
    n, d, k = 3000, 6, 5
    pts, _ = blobs(rng, n, d, k, spread=0.05)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    lab_a = mem_array((n,), np.int32, ctx=ctx)
    lab_b = mem_array((n,), np.int32, ctx=ctx)
    # resident path (default budget admits the panel)
    c_a, i_a = kmeans_fit(P, k, n_iters=5, seed=7, labels_out=lab_a,
                          ctx=ctx)
    # force streaming by denying HBM residency
    old = ctx.config.hbm_budget
    ctx.config.hbm_budget = 1 << 10
    try:
        c_b, i_b = kmeans_fit(P, k, n_iters=5, seed=7, labels_out=lab_b,
                              ctx=ctx)
    finally:
        ctx.config.hbm_budget = old
    np.testing.assert_allclose(c_a, c_b, rtol=1e-5, atol=1e-5)
    # the tiny hbm_budget also shrinks the streaming block size, so the
    # fp64 inertia accumulates in a different order: tolerance covers
    # accumulation-order drift, not a semantic difference
    np.testing.assert_allclose(i_a, i_b, rtol=1e-3)
    np.testing.assert_array_equal(lab_a.read_all(), lab_b.read_all())


def test_kmeans_fit_checkpoint_resume(ctx, rng, tmp_path):
    """A fit interrupted between iterations resumes from its state file
    and matches an uninterrupted run exactly (same seed, same path)."""
    import os
    n, d, k = 2000, 6, 4
    pts, _ = blobs(rng, n, d, k, spread=0.05)
    P = mem_array((n, d), np.float32, data=pts, ctx=ctx)
    state = str(tmp_path / "km_state.npz")

    want_c, want_i = kmeans_fit(P, k, n_iters=6, seed=5, tol=-1.0, ctx=ctx)

    # a completed checkpointed run consumes its state file
    kmeans_fit(P, k, n_iters=3, seed=5, tol=-1.0, state_path=state, ctx=ctx)
    assert not os.path.exists(state)

    # simulate a crash after iteration 2: seed the state file exactly as
    # save_state would have left it mid-run
    c3, _ = kmeans_fit(P, k, n_iters=3, seed=5, tol=-1.0, ctx=ctx)
    np.savez(state + ".tmp.npz", attempt=0, it=2, centers=c3,
             best_inertia=np.inf, best_centers=np.zeros((0, 0)))
    os.replace(state + ".tmp.npz", state)

    # resume at iter 3 and finish 6 — must equal the straight run
    got_c, got_i = kmeans_fit(P, k, n_iters=6, seed=5, tol=-1.0,
                              state_path=state, ctx=ctx)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5, atol=1e-5)
    assert not os.path.exists(state)


def test_lloyd_iter_fp64_exact(ctx, rng):
    """FP_DOUBLE_PRECISION parity (reference: bof_types.h double build of
    the kmeans stack): fp64 points run the exact host Lloyd step — the
    returned centers/inertia match a pure-fp64 numpy evaluation of the
    same partial-distance formula to the last ulps."""
    n, d, k = 1500, 12, 5
    pts64 = rng.standard_normal((n, d))  # float64
    P = mem_array((n, d), np.float64, data=pts64, ctx=ctx)
    c0 = pts64[:k].copy()
    L = mem_array((n,), np.int32, ctx=ctx)
    got_c, got_i, counts = lloyds_iter(P, c0, labels_out=L, blk_rows=211,
                                       ctx=ctx)
    assert got_c.dtype == np.float64

    # golden: identical formula in fp64 (c_norms - 2 P C^T, |p|^2 added)
    g = pts64 @ c0.T
    pd = (c0 * c0).sum(1)[None, :] - 2.0 * g
    labels = pd.argmin(1)
    want_c = np.stack([pts64[labels == c].mean(0) if (labels == c).any()
                       else c0[c] for c in range(k)])
    np.testing.assert_allclose(got_c, want_c, rtol=1e-14, atol=0)
    np.testing.assert_array_equal(L.read_all(), labels)
    want_i = float(pd.min(1).sum() + (pts64 * pts64).sum())
    np.testing.assert_allclose(got_i, want_i, rtol=1e-12)
    assert counts.sum() == n


def test_kmeans_fit_fp64(ctx, rng):
    """kmeans_fit end-to-end on fp64 points: converges, returns fp64
    centers, and never touches the float32 device path."""
    n, d, k = 1800, 8, 4
    pts32, _ = blobs(rng, n, d, k, spread=0.03)
    pts64 = pts32.astype(np.float64)
    P = mem_array((n, d), np.float64, data=pts64, ctx=ctx)
    centers, inertia = kmeans_fit(P, k, n_iters=8, seed=1, ctx=ctx)
    assert centers.dtype == np.float64
    # same fit on the float32 copy must land on the same clustering
    P32 = mem_array((n, d), np.float32, data=pts32, ctx=ctx)
    c32, i32 = kmeans_fit(P32, k, n_iters=8, seed=1, ctx=ctx)
    np.testing.assert_allclose(np.sort(centers, 0), np.sort(c32, 0),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(inertia, i32, rtol=1e-2)
