"""Application-layer tests: out-of-core spectral solver vs scipy svds."""
import numpy as np
import pytest
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from bof_tpu.apps import block_power_svd
from bof_tpu.sparse import CsrFlashMatrix


def test_block_power_svd_matches_scipy(ctx, rng):
    ctx.config.max_nnzs = 2048
    m, k, L = 300, 120, 5
    a_sp = sps.random(m, k, density=0.05, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(3))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    sigma, v = block_power_svd(A, L, n_iters=40, tol=1e-9, ctx=ctx)
    want = np.sort(spla.svds(a_sp.astype(np.float64), k=L,
                             return_singular_vectors=False))[::-1]
    np.testing.assert_allclose(sigma, want, rtol=1e-3)
    # right singular vectors: A^T A v_i = sigma_i^2 v_i
    ata = (a_sp.T @ a_sp).toarray().astype(np.float64)
    for i in range(L):
        resid = np.linalg.norm(ata @ v[:, i] - sigma[i] ** 2 * v[:, i])
        assert resid < 1e-2 * max(sigma[i] ** 2, 1.0)


def test_topic_model_recovers_planted_topics(ctx, rng):
    """Synthetic corpus with disjoint-vocabulary topics: the pipeline must
    assign same-topic docs to the same cluster and put each recovered
    topic's mass on the right vocabulary slice."""
    from bof_tpu.apps import topic_model
    n_topics, docs_per, vocab_per = 4, 120, 50
    docs = n_topics * docs_per
    vocab = n_topics * vocab_per
    rows, cols, vals = [], [], []
    rs = np.random.RandomState(0)
    for t in range(n_topics):
        for d in range(docs_per):
            doc = t * docs_per + d
            words = t * vocab_per + rs.randint(0, vocab_per, 20)
            for w in words:
                rows.append(doc)
                cols.append(w)
                vals.append(1.0)
    A_sp = sps.csr_matrix(
        (np.array(vals, np.float32), (rows, cols)), shape=(docs, vocab))
    A_sp.sum_duplicates()
    ctx.config.max_nnzs = 2048
    A = CsrFlashMatrix.from_scipy(A_sp, ctx=ctx)
    tw, labels = topic_model(A, n_topics, proj_dim=32, n_iters=10, ctx=ctx)
    assert tw.shape == (n_topics, vocab)
    np.testing.assert_allclose(tw.sum(1), 1.0, rtol=1e-5)
    # each true topic's docs should be (almost) one label
    purity = 0
    for t in range(n_topics):
        seg = labels[t * docs_per:(t + 1) * docs_per]
        purity += np.bincount(seg, minlength=n_topics).max()
    assert purity / docs > 0.9
    # each recovered topic's probability mass concentrates on one slice
    for t in range(n_topics):
        slice_mass = max(tw[t, s * vocab_per:(s + 1) * vocab_per].sum()
                         for s in range(n_topics))
        assert slice_mass > 0.85
