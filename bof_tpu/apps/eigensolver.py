"""Out-of-core spectral solvers over flash-resident sparse matrices.

The reference's headline application (NSDI'19 paper §5 Table 4: a block
Krylov-Schur eigensolver on bag-of-words matrices, Spark-beating SVD) is
built by composing library kernels — csrmm against A and A^T with host
orthogonalization.  This module provides two solvers with that kernel mix:

- `block_lanczos_svd` (the paper-parity solver): block Lanczos with full
  reorthogonalization and thick (Krylov-Schur-style) restarts on the
  A^T A operator.  Polynomial acceleration makes it converge in far fewer
  csrmm passes than power iteration on clustered spectra — exactly the
  bag-of-words case the paper targets.
- `block_power_svd`: simple block subspace iteration (kept as the
  baseline and for very small problems).

Both use the same operator application:

    W = A V        (csrmm on flash-resident A)
    U = A^T W      (csrmm on the csrcsc-materialized transpose)

the transpose is materialized once, like the reference's 'T' dispatch
(csrmm.cpp:364-420).  Host memory holds only the (k x kdim) Krylov basis
and (kdim x kdim) projections; the (m x b) intermediate panel W lives on
flash scratch.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..context import get_context
from ..core.flash_array import flash_empty, flash_free, mem_array
from ..sparse import CsrFlashMatrix, csrcsc_scratch, csrmm
from ..utils import LOG, METRICS, Timer


def _apply_ata_one_pass(a: CsrFlashMatrix, v_np: np.ndarray,
                        ctx) -> np.ndarray:
    """U = A^T (A V) in ONE streaming pass over A's row blocks: A's bytes
    cross the disk exactly once per operator application; the (m x b)
    intermediate panel and the materialized transpose never exist
    anywhere — strictly less I/O than the two-csrmm composition (which
    reads A, writes+reads W, and reads the csrcsc'd A^T).

    Honors FlashConfig.sparse_compute: 'host' runs both block products as
    scipy on the pinned tile (the reference's MKL-on-host execution
    model, csrmm_task.h); 'device' runs both as ELL gather products on
    the MXU/VPU (_apply_ata_one_pass_device); 'auto' places by the
    measured link rate like csrmm's dispatch (csrmm.cpp:364-420 is the
    reference's 'T' structure this operator replaces)."""
    mode = getattr(ctx.config, "sparse_compute", "host")
    from ..ops.device import dtype_native_on_device
    if not dtype_native_on_device(a.vals.dtype):
        # fp64 CSR values on a backend that would silently narrow them:
        # the scipy host path is the exact execution model — the same
        # guard every other device path applies (sparse/csrmm.py:149-159)
        mode = "host"
    if mode == "auto":
        from ..ops.device import link_gbps_estimate
        link = link_gbps_estimate()
        if link >= 1.0:
            mode = "device"  # real host: MXU + gather wins
        else:
            b = v_np.shape[1]
            nnz = float(a.nnz)
            # device ships forward ELL + transposed ELL (~2x nnz*(4+4)
            # padded) + V up and U partials down; host runs two scipy
            # products per block in place
            t_dev = (2 * nnz * 16.0 + 2 * a.shape[1] * b * 4.0) / (link * 1e9)
            t_host = 2.0 * (2.0 * nnz * b) / 2.0e9
            mode = "host" if t_host < t_dev else "device"
    if mode == "device":
        return _apply_ata_one_pass_device(a, v_np, ctx)
    import scipy.sparse as sps

    from ..sparse.csr import fill_row_blocks, stream_row_blocks

    cfg = ctx.config
    m, k = a.shape
    ia_np = a.read_ia()
    blocks = fill_row_blocks(ia_np, cfg.max_nnzs)
    v32 = np.ascontiguousarray(v_np, np.float32)
    U = np.zeros((k, v32.shape[1]), np.float64)
    for r, e, ja_blk, va_blk in stream_row_blocks(a, ia_np, blocks, ctx):
        blk = sps.csr_matrix(
            (va_blk, ja_blk.astype(np.int64),
             (ia_np[r:e + 1] - int(ia_np[r])).astype(np.int64)),
            shape=(e - r, k))
        w_rb = blk @ v32                     # (rows, b)
        U += blk.T @ w_rb                    # (k, b) accumulate
    METRICS.add("eig.op_applies")
    return U


def _one_pass_stream(a: CsrFlashMatrix, v_np: np.ndarray, ctx, put_v,
                     fwd_product, t_product, min_rows: int = 8,
                     fold_u=None, finalize=None) -> np.ndarray:
    """Shared skeleton of the one-pass device operator (impl-dispatch and
    mesh-sharded variants): stream nnz-budgeted row blocks, count-sorted
    ELL banding on BOTH axes (documents and word frequencies are each
    power-law in bag-of-words data — each band's rmax is tight to its own
    rows/columns, 6.4x measured on zipf blocks, sparse/csrmm.py), the
    sub-block transposed to block-local CSC on the host (it is already in
    DRAM), fp64 U accumulator on the host, A's bytes across the disk
    exactly once.  Variants differ only in how arrays reach the device
    and what executes one ELL gather product:
    `fwd_product(v_dev, ja, va)` -> the W panel the transposed half
    consumes; `t_product(w, ja, va)` -> one U partial; `fold_u(u_part,
    cols_sel, U)` -> accumulate one partial into the host U (default:
    materialize the whole partial — multihost variants fold only their
    addressable shards); `finalize(U)` -> the returned operator value
    (default: U itself — multihost variants sum the per-process
    partials)."""
    import scipy.sparse as sps

    from ..sparse import spmm_device as sdev
    from ..sparse.csr import fill_row_blocks, stream_row_blocks

    cfg = ctx.config
    m, k = a.shape
    ia_np = a.read_ia()
    blocks = fill_row_blocks(ia_np, cfg.max_nnzs)
    v32 = np.ascontiguousarray(v_np, np.float32)
    b = v32.shape[1]
    v_dev = put_v(v32)
    entry_cap = max(1 << 14, int(cfg.hbm_budget // 6 // (b * 4)))
    sort_rows = getattr(cfg, "ell_sort_rows", True)
    narrow = getattr(cfg, "ell_idx_narrow", True)
    fwd_idt = sdev.ell_idx_dtype(k, narrow)  # forward panel height = k
    U = np.zeros((k, b), np.float64)
    for r, e, ja_blk, va_blk in stream_row_blocks(a, ia_np, blocks, ctx):
        blk_ia = ia_np[r:e + 1] - int(ia_np[r])
        counts = np.diff(blk_ia)
        # forward rows band by nnz; the transposed build selects the
        # same rows so its indices line up with W's (sorted) row order
        order = (np.argsort(counts, kind="stable") if sort_rows
                 else np.arange(e - r))
        blk_sp = sps.csr_matrix(
            (va_blk, ja_blk.astype(np.int64), blk_ia.astype(np.int64)),
            shape=(e - r, k))
        for s0, s1 in sdev.ell_row_ranges(counts[order], entry_cap):
            rows_sel = order[s0:s1]
            ja_e, va_e = sdev.to_ell_rows(blk_ia, ja_blk, va_blk,
                                          rows_sel, min_rows=min_rows,
                                          idx_dtype=fwd_idt,
                                          counts=counts)
            w = fwd_product(v_dev, ja_e, va_e)
            # transpose the selected rows in DRAM; the CSC's row indices
            # are positions within rows_sel — exactly W's row order
            sub = blk_sp[rows_sel].tocsc()
            ccounts = np.diff(sub.indptr)
            csort = np.argsort(ccounts, kind="stable")
            # transposed panel = W; its row indices < len(rows_sel)
            t_idt = sdev.ell_idx_dtype(len(rows_sel), narrow)
            for c0, c1 in sdev.ell_row_ranges(ccounts[csort], entry_cap):
                cols_sel = csort[c0:c1]
                cja, cva = sdev.to_ell_rows(
                    sub.indptr.astype(np.int64), sub.indices, sub.data,
                    cols_sel, min_rows=min_rows, idx_dtype=t_idt,
                    counts=ccounts)
                u_part = t_product(w, cja, cva)
                if fold_u is not None:
                    fold_u(u_part, cols_sel, U)
                else:
                    U[cols_sel] += np.asarray(u_part)[:len(cols_sel)]
    METRICS.add("eig.op_applies")
    return U if finalize is None else finalize(U)


def _apply_ata_one_pass_device(a: CsrFlashMatrix, v_np: np.ndarray,
                               ctx) -> np.ndarray:
    """Device variant of the one-pass operator: per nnz-budgeted row
    block, BOTH halves run as ELL gather products on the device —
    W_sub = A_sub V (forward ELL, rows gathered from the V panel) and
    U += A_sub^T W_sub (the transposed half is just another gather
    product whose panel is the HBM-resident W_sub).  No scatter anywhere
    (scatter serializes on TPU), every shape power-of-two bucketed.
    Reference semantics: the csrmm 'T' dispatch (csrmm.cpp:364-420)
    composed with the 'N' product, fused per block."""
    import jax

    from ..sparse import spmm_device as sdev

    impl = getattr(ctx.config, "sparse_device_impl", "auto")

    def product(panel, ja, va):
        return sdev.spmm_ell_block_dispatch(panel, ja, va, impl)

    return _one_pass_stream(a, v_np, ctx, put_v=jax.device_put,
                            fwd_product=product, t_product=product)


@functools.lru_cache(maxsize=None)
def _replicate_step(mesh):
    """jitted identity that reshards a row-sharded array to replicated —
    XLA lowers it to ONE all-gather riding ICI.  Cached per mesh so every
    operator application reuses the jit trace cache."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))


def _apply_ata_one_pass_sharded(a: CsrFlashMatrix, v_np: np.ndarray,
                                mesh, ctx) -> np.ndarray:
    """One-pass U = A^T (A V) with BOTH ELL halves row-sharded over the
    device mesh.  Per nnz-budgeted row block: the forward product
    row-shards A's rows (pure row data parallelism, the csrmm_sp layout);
    the W panel is then resharded replicated by a single XLA all-gather
    over ICI; the transposed half row-shards A's columns against the
    replicated W.  A's bytes still cross the disk exactly once, the fp64
    U accumulator stays on the host, and count-sorted ELL banding applies
    on both (power-law) axes.  Multi-host: each process folds only the
    U-partial rows its devices own; one fp64 all-gather+sum at the end
    reconstructs U (each row of every partial is computed by exactly one
    device, so the sum never double-counts).
    Reference semantics: csrmm 'T' dispatch (csrmm.cpp:364-420) fused
    with the 'N' product per block, distributed."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.csrmm_sp import sharded_spmm_step
    from ..parallel.mesh import device_put_sharded

    multihost = jax.process_count() > 1
    from ..ops.device import dtype_native_on_device
    if not dtype_native_on_device(a.vals.dtype):
        # device-only path: fp64 values would silently narrow on upload
        raise ValueError(
            f"sharded one_pass cannot represent {a.vals.dtype} on this "
            "backend; use one_pass without a mesh (exact host path)")
    axes = mesh.axis_names
    n_dev = int(np.prod(mesh.devices.shape))
    sh_rep = NamedSharding(mesh, P())
    sh_rows = NamedSharding(mesh, P(axes, None))
    step = sharded_spmm_step(mesh)
    replicate = _replicate_step(mesh)

    def fwd_product(v_dev, ja, va):
        w_sub = step(v_dev, device_put_sharded(ja, sh_rows),
                     device_put_sharded(va, sh_rows))
        return replicate(w_sub)  # one all-gather on ICI

    def t_product(w_rep, ja, va):
        return step(w_rep, device_put_sharded(ja, sh_rows),
                    device_put_sharded(va, sh_rows))

    fold_u = finalize = None
    if multihost:
        def fold_u(u_part, cols_sel, U):
            # fold only the rows this process's devices own (the partial
            # is row-sharded; unaddressable shards live on other hosts)
            nsel = len(cols_sel)
            for shard in u_part.addressable_shards:
                r0 = shard.index[0].start or 0
                r1c = min(shard.index[0].stop or nsel, nsel)
                if r0 >= r1c:
                    continue
                U[cols_sel[r0:r1c]] += np.asarray(
                    shard.data)[:r1c - r0].astype(np.float64)

        def finalize(U):
            # disjoint per-device contributions: summing the per-process
            # partials reconstructs U exactly once per contribution
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(U)).sum(axis=0)

    return _one_pass_stream(
        a, v_np, ctx, put_v=lambda v: device_put_sharded(v, sh_rep),
        fwd_product=fwd_product, t_product=t_product,
        min_rows=max(8, n_dev), fold_u=fold_u, finalize=finalize)


def block_power_svd(a: CsrFlashMatrix, n_vals: int, n_iters: int = 12,
                    seed: int = 0, tol: float = 1e-6,
                    one_pass: Optional[bool] = None, ctx=None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Top `n_vals` singular values and right singular vectors of A.

    Returns (sigma (L,) descending, V (k, L)).  Only (k x L) and (L x L)
    host matrices are resident.  `one_pass` (default on) applies A^T A
    in one streaming pass over A; one_pass=False materializes A^T via
    csrcsc and composes two csrmm passes (the reference's 'T' dispatch
    structure, csrmm.cpp:364-420).
    """
    ctx = ctx or a.ctx or get_context()
    m, k = a.shape
    L = n_vals
    rng = np.random.default_rng(seed)
    timer = Timer()

    at = W = None
    if one_pass is None or one_pass:
        def half_step(v_np):
            return _apply_ata_one_pass(a, v_np, ctx)
    else:
        at = csrcsc_scratch(a, ctx=ctx)  # A^T, materialized once
        W = flash_empty((m, L), np.float32, ctx=ctx)
        V = mem_array((k, L), np.float32, ctx=ctx)
        U = mem_array((k, L), np.float32, ctx=ctx)

        def half_step(v_np):
            """U = (A^T A) V via two flash csrmm passes."""
            V.write_all(v_np.astype(np.float32))
            csrmm(a, V, W, ctx=ctx)
            csrmm(at, W, U, ctx=ctx)
            METRICS.add("eig.op_applies")
            return U.read_all().astype(np.float64)

    v_np, _ = np.linalg.qr(rng.standard_normal((k, L)))
    try:
        sigma = np.zeros(L)
        for it in range(n_iters):
            u_np = half_step(v_np)
            g = v_np.T @ u_np                     # Rayleigh quotient
            evals = np.linalg.eigvalsh((g + g.T) / 2)[::-1][:L]
            new_sigma = np.sqrt(np.maximum(evals, 0.0))
            delta = float(np.abs(new_sigma - sigma).max()
                          / (np.abs(new_sigma).max() or 1.0))
            sigma = new_sigma
            v_np, _ = np.linalg.qr(u_np)          # power step
            LOG.debug("svd iter %d: sigma_max %.6g delta %.2e (%.0f ms)",
                      it, sigma[0] if L else 0.0, delta, timer.elapsed_ms())
            if it > 0 and delta < tol:
                break
        # final Rayleigh-Ritz rotation on the converged subspace
        u_np = half_step(v_np)
        g = v_np.T @ u_np
        evals, evecs = np.linalg.eigh((g + g.T) / 2)
        order = np.argsort(evals)[::-1][:L]
        sigma = np.sqrt(np.maximum(evals[order], 0.0))
        v_out = (v_np @ evecs[:, order]).astype(np.float32)
        return sigma, v_out
    finally:
        if W is not None:
            flash_free(W)
        if at is not None:
            for arr in (at.ia, at.ja, at.vals):
                flash_free(arr)


def block_lanczos_svd(a: CsrFlashMatrix, n_vals: int,
                      block_size: Optional[int] = None,
                      max_kdim: Optional[int] = None,
                      n_restarts: int = 8, tol: float = 1e-6,
                      seed: int = 0, state_path: Optional[str] = None,
                      one_pass: Optional[bool] = None,
                      mesh=None, ctx=None) -> Tuple[np.ndarray, np.ndarray]:
    """Top `n_vals` singular values / right singular vectors of A by block
    Lanczos with thick restart on B = A^T A (the paper's block
    Krylov-Schur solver role, Table 4).

    Each operator application is two out-of-core csrmm passes.  The Krylov
    basis is fully reorthogonalized on the host (k x kdim, kdim <= ~4L —
    small next to the flash-resident A).  On clustered spectra the degree-d
    Krylov polynomial separates eigenvalues that plain power iteration
    (rate (sigma_{L+1}/sigma_L)^2 per pass) cannot — fewer csrmm passes for
    the same tolerance, which is the whole game out-of-core.

    `state_path` makes the restart loop checkpointable: each completed
    cycle atomically saves (panel, Ritz pairs, cycle index), and a rerun
    resumes from the last finished cycle — extending the library's
    kernel-boundary durability (SURVEY §5 checkpoint/resume) to this
    hours-long solver's host state.  The file is removed on convergence.

    With `mesh`, every operator application runs row-sharded over the
    device mesh: by default the two csrmm passes (parallel/csrmm_sp.py,
    works multi-host); with an explicit one_pass=True, the single
    streaming pass with both ELL halves sharded and one ICI all-gather
    between them (_apply_ata_one_pass_sharded, single-process meshes).
    The small host-side Krylov algebra is unchanged either way.
    `one_pass` (default on when no mesh is given) applies the operator
    in a single streaming pass over A (_apply_ata_one_pass) instead of
    materializing A^T + the W panel — strictly less I/O per application.

    Returns (sigma (L,) descending, V (k, L))."""
    import os
    ctx = ctx or a.ctx or get_context()
    if n_restarts < 1:
        raise ValueError("n_restarts must be >= 1")
    m, k = a.shape
    L = n_vals
    b = int(block_size or min(max(L, 2), max(2, k // 4)))
    kdim = int(max_kdim or min(k, max(4 * L, 3 * b)))
    rng = np.random.default_rng(seed)
    timer = Timer()

    if one_pass is None:
        # multi-host default: the one-pass operator (fully supported);
        # the two-csrmm composition needs shared scratch it cannot assume
        import jax as _jx
        one_pass = mesh is None or _jx.process_count() > 1
    at = W = None
    if one_pass and mesh is not None:
        # explicit opt-in: one streaming pass over A with both ELL halves
        # row-sharded over the mesh (multi-host folds per-process shards
        # and all-gathers the fp64 U at the end)

        def apply_op(v_np: np.ndarray) -> np.ndarray:
            return _apply_ata_one_pass_sharded(a, v_np, mesh, ctx)
    elif one_pass:
        def apply_op(v_np: np.ndarray) -> np.ndarray:
            """B v = A^T (A v) in one streaming pass over A."""
            return _apply_ata_one_pass(a, v_np, ctx)
    else:
        at = csrcsc_scratch(a, ctx=ctx)  # A^T, materialized once
        W = flash_empty((m, b), np.float32, ctx=ctx)

        if mesh is not None:
            import jax as _jax
            if _jax.process_count() > 1:
                raise ValueError(
                    "one_pass=False over a multi-host mesh: the W/U "
                    "scratch panels live in per-process scratch dirs, so "
                    "each process would see only its own csrmm_sharded "
                    "shard writes; use one_pass=True (multi-host "
                    "supported) or a single process")
            from ..parallel import csrmm_sharded

            def _spmm(mat, x, out):
                csrmm_sharded(mat, x, out, mesh=mesh, ctx=ctx)
        else:
            def _spmm(mat, x, out):
                csrmm(mat, x, out, ctx=ctx)

        def apply_op(v_np: np.ndarray) -> np.ndarray:
            """B v = A^T (A v), (k, w) -> (k, w) float64, w <= b."""
            w = v_np.shape[1]
            Vp = mem_array((k, w), np.float32,
                           data=v_np.astype(np.float32), ctx=ctx)
            Wp = (W if w == b
                  else flash_empty((m, w), np.float32, ctx=ctx))
            Up = mem_array((k, w), np.float32, ctx=ctx)
            try:
                _spmm(a, Vp, Wp)
                _spmm(at, Wp, Up)
            finally:
                if Wp is not W:
                    flash_free(Wp)
            METRICS.add("eig.op_applies")
            return Up.read_all().astype(np.float64)

    def orthonormalize(R: np.ndarray, basis: Optional[np.ndarray]):
        """Two-pass block Gram-Schmidt against `basis`, then QR; random
        replacement columns on (near-)breakdown."""
        for _ in range(2):
            if basis is not None and basis.size:
                R = R - basis @ (basis.T @ R)
        Q, Rr = np.linalg.qr(R)
        # detect rank deficiency: tiny diagonal => replace with random dirs
        bad = np.abs(np.diag(Rr)) < 1e-10 * max(1.0, np.abs(Rr).max())
        if bad.any():
            Q[:, bad] = rng.standard_normal((k, int(bad.sum())))
            for _ in range(2):
                if basis is not None and basis.size:
                    Q = Q - basis @ (basis.T @ Q)
                Q, _ = np.linalg.qr(Q)
        return Q

    def save_state(rnd, panel, theta, Y):
        tmp = state_path + ".tmp.npz"  # .npz suffix: savez won't rename it
        np.savez(tmp, rnd=rnd, panel=panel, theta=theta,
                 Y=Y if Y is not None else np.zeros((0, 0)))
        os.replace(tmp, state_path)

    try:
        panel = orthonormalize(rng.standard_normal((k, b)), None)
        ritz_theta = np.zeros(L)
        ritz_Y: Optional[np.ndarray] = None
        converged = False
        start_rnd = 0
        if state_path and os.path.exists(state_path):
            with np.load(state_path) as st:
                start_rnd = int(st["rnd"]) + 1
                panel = st["panel"]
                ritz_theta = st["theta"]
                ritz_Y = st["Y"] if st["Y"].size else None
            LOG.info("lanczos: resuming from %s at restart %d",
                     state_path, start_rnd)
        for rnd in range(start_rnd, n_restarts):
            panels = [panel]
            Us = []
            # grow the Krylov basis: every appended panel gets one operator
            # application; the residual of B q_j against the basis is the
            # next panel (full reorthogonalization)
            while True:
                basis = np.hstack(panels)
                Uj = apply_op(panels[-1])
                Us.append(Uj)
                if basis.shape[1] + b > kdim:
                    break
                panels.append(orthonormalize(Uj.copy(), basis))
            Q = np.hstack(panels)          # (k, d) — every panel applied
            BU = np.hstack(Us)             # B @ Q, same column order
            G = Q.T @ BU
            G = (G + G.T) / 2
            evals, S = np.linalg.eigh(G)
            order = np.argsort(evals)[::-1][:L]
            theta = np.maximum(evals[order], 0.0)
            Y = Q @ S[:, order]            # Ritz vectors (k, L)
            # residuals of the Ritz pairs under B, from stored BU panels
            BY = BU @ S[:, order]
            resid = np.linalg.norm(BY - Y * theta[None, :], axis=0)
            scale = max(float(theta[0]), 1e-30)
            delta = float(np.abs(np.sqrt(theta) - np.sqrt(ritz_theta)).max()
                          / max(np.sqrt(scale), 1e-30))
            ritz_theta, ritz_Y = theta, Y
            LOG.debug("lanczos restart %d: sigma_max %.6g max-resid %.2e "
                      "delta %.2e (%.0f ms)", rnd, np.sqrt(scale),
                      float(resid.max() / scale), delta, timer.elapsed_ms())
            if resid.max() / scale < tol or delta < tol:
                converged = True
                break
            # thick restart: compress to the Ritz block, pad to b with the
            # strongest residual directions so the next cycle explores new
            # space (Krylov-Schur keeps exactly this invariant subspace)
            carry = Y
            if L < b:
                extra = orthonormalize(
                    BY - Y * theta[None, :]
                    if L > 0 else rng.standard_normal((k, b)), Y)
                carry = np.hstack([Y, extra[:, :b - L]])
            panel = orthonormalize(carry[:, :b], None)
            if state_path:
                save_state(rnd, panel, ritz_theta, ritz_Y)
        if converged and state_path and os.path.exists(state_path):
            os.unlink(state_path)  # state consumed; an unconverged run
            # (restart budget exhausted) keeps it for a longer rerun
        sigma = np.sqrt(ritz_theta)
        return sigma, ritz_Y.astype(np.float32)
    finally:
        if W is not None:
            flash_free(W)
        if at is not None:
            for arr in (at.ia, at.ja, at.vals):
                flash_free(arr)
