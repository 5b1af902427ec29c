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
