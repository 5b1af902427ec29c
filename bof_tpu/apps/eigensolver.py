"""Out-of-core spectral solver over flash-resident sparse matrices.

The reference's headline applications (NSDI'19 paper §5: block
Krylov-Schur eigensolver on bag-of-words matrices, Spark-beating SVD) are
built by composing library kernels — csrmm against A and A^T with host
orthogonalization.  This module provides that composition: block subspace
iteration computing the top singular values/vectors of a sparse flash
matrix A, with

    W = A V        (csrmm on flash-resident A)
    U = A^T W      (csrmm on the csrcsc-materialized transpose)
    V, _ = QR(U)   (host; U is k x L, small because L is)

exactly the kernel mix the paper's eigensolver exercises (csrmm dominates
runtime; the transpose is materialized once, like the reference's 'T'
dispatch, csrmm.cpp:364-420).  A final Rayleigh-Ritz rotation extracts
Ritz values/vectors from the converged subspace.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..context import get_context
from ..core.flash_array import flash_empty, flash_free, mem_array
from ..sparse import CsrFlashMatrix, csrcsc_scratch, csrmm
from ..utils import LOG, Timer


def block_power_svd(a: CsrFlashMatrix, n_vals: int, n_iters: int = 12,
                    seed: int = 0, tol: float = 1e-6, ctx=None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Top `n_vals` singular values and right singular vectors of A.

    Returns (sigma (L,) descending, V (k, L)).  V/W panels live on flash;
    only (k x L) and (L x L) host matrices are resident.
    """
    ctx = ctx or a.ctx or get_context()
    m, k = a.shape
    L = n_vals
    rng = np.random.default_rng(seed)
    timer = Timer()

    at = csrcsc_scratch(a, ctx=ctx)  # A^T, materialized once
    v_np, _ = np.linalg.qr(rng.standard_normal((k, L)))
    V = mem_array((k, L), np.float32, data=v_np.astype(np.float32), ctx=ctx)
    W = flash_empty((m, L), np.float32, ctx=ctx)
    U = mem_array((k, L), np.float32, ctx=ctx)

    def half_step():
        """U = (A^T A) V via two flash csrmm passes."""
        csrmm(a, V, W, ctx=ctx)
        csrmm(at, W, U, ctx=ctx)
        return U.read_all().astype(np.float64)

    try:
        sigma = np.zeros(L)
        for it in range(n_iters):
            u_np = half_step()
            g = v_np.T @ u_np                     # Rayleigh quotient
            evals = np.linalg.eigvalsh((g + g.T) / 2)[::-1][:L]
            new_sigma = np.sqrt(np.maximum(evals, 0.0))
            delta = float(np.abs(new_sigma - sigma).max()
                          / (np.abs(new_sigma).max() or 1.0))
            sigma = new_sigma
            v_np, _ = np.linalg.qr(u_np)          # power step
            V.write_all(v_np.astype(np.float32))
            LOG.debug("svd iter %d: sigma_max %.6g delta %.2e (%.0f ms)",
                      it, sigma[0] if L else 0.0, delta, timer.elapsed_ms())
            if it > 0 and delta < tol:
                break
        # final Rayleigh-Ritz rotation on the converged subspace
        u_np = half_step()
        g = v_np.T @ u_np
        evals, evecs = np.linalg.eigh((g + g.T) / 2)
        order = np.argsort(evals)[::-1][:L]
        sigma = np.sqrt(np.maximum(evals[order], 0.0))
        v_out = (v_np @ evecs[:, order]).astype(np.float32)
        return sigma, v_out
    finally:
        flash_free(W)
        for arr in (at.ia, at.ja, at.vals):
            flash_free(arr)
