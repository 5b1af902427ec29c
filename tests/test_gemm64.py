"""Differential tests for the sliced fp64 GEMM path (ops/gemm64.py).

The reference runs every kernel in FP_DOUBLE_PRECISION by recompiling
with FPTYPE=double (reference: include/bof_types.h:24-42); here float64
gemm on fp64-less accelerators goes through exact int8 mantissa slicing.
Golden model is numpy float64 matmul; because the slicing is error-free
up to 2^-56 of the per-row/column scale, tolerances are near machine-eps
— far tighter than the fp32 suite's 2e-4.
"""
import itertools

import numpy as np
import pytest

from bof_tpu import map_array, mem_array
from bof_tpu.ops import gemm
from bof_tpu.ops.gemm64 import _pow2_scale, _split_slices, gemm64


@pytest.fixture
def ctx64(ctx):
    ctx.config.fp64_device = "sliced"  # force off-CPU-native path in tests
    return ctx


def golden(a, b, c, alpha, beta, ta, tb):
    opa = a.T if ta == "T" else a
    opb = b.T if tb == "T" else b
    out = alpha * (opa @ opb)
    if beta != 0.0:
        out = out + beta * c
    return out


def run64(ctx, rng, order, ta, tb, alpha=1.0, beta=0.0,
          m=37, n=29, k=41, blk=16, rtol=1e-12, scale_rows=None,
          scale_cols=None, k_flush=None, mixed_orders=None,
          file_backed=False, tmp_path=None):
    a_shape = (k, m) if ta == "T" else (m, k)
    b_shape = (n, k) if tb == "T" else (k, n)
    a_np = rng.standard_normal(a_shape)
    b_np = rng.standard_normal(b_shape)
    c_np = rng.standard_normal((m, n))
    if scale_rows is not None:  # per-row-of-op(A) dynamic range
        a_np = a_np * (scale_rows[:, None] if ta == "N"
                       else scale_rows[None, :])
    if scale_cols is not None:  # per-col-of-op(B) dynamic range
        b_np = b_np * (scale_cols[None, :] if tb == "N"
                       else scale_cols[:, None])

    orders = mixed_orders or (order, order, order)
    if file_backed:
        arrs = []
        for nm, shape, data in (("A", a_shape, a_np), ("B", b_shape, b_np),
                                ("C", (m, n), c_np)):
            arr = map_array(str(tmp_path / f"{nm}64.bin"), shape,
                            np.float64, orders[len(arrs)], create=True,
                            ctx=ctx)
            arr.write_all(data)
            arrs.append(arr)
        A, B, C = arrs
    else:
        A = mem_array(a_shape, np.float64, orders[0], data=a_np, ctx=ctx)
        B = mem_array(b_shape, np.float64, orders[1], data=b_np, ctx=ctx)
        C = mem_array((m, n), np.float64, orders[2], data=c_np, ctx=ctx)

    if k_flush is None:
        gemm(A, B, C, alpha=alpha, beta=beta, transa=ta, transb=tb,
             blk=blk, ctx=ctx)  # exercises the fp64 dispatch in gemm()
    else:
        gemm64(A, B, C, alpha=alpha, beta=beta, transa=ta, transb=tb,
               blk=blk, ctx=ctx, k_flush=k_flush)
    got = C.read_all()
    want = golden(a_np, b_np, c_np, alpha, beta, ta, tb)
    assert got.dtype == np.float64
    # error bound: ~k * 2^-55 of sigma_r * tau_c; normalize per element
    scale = (np.abs(a_np if ta == "N" else a_np.T).max(axis=1)[:, None]
             * np.abs(b_np if tb == "N" else b_np.T).max(axis=0)[None, :])
    err = np.abs(got - want) / np.maximum(scale * k, 1e-300)
    assert err.max() < rtol, f"max scaled err {err.max():.3e}"


@pytest.mark.parametrize("order,ta,tb",
                         list(itertools.product("RC", "NT", "NT")))
def test_all_eight_configs(ctx64, rng, order, ta, tb):
    run64(ctx64, rng, order, ta, tb)


def test_alpha_beta(ctx64, rng):
    run64(ctx64, rng, "R", "N", "N", alpha=-2.5, beta=0.75)
    run64(ctx64, rng, "C", "T", "T", alpha=1.25, beta=-0.5)


def test_mixed_layouts(ctx64, rng):
    run64(ctx64, rng, "R", "N", "T", beta=0.5,
          mixed_orders=("R", "C", "C"))


def test_file_backed_multiblock(ctx64, rng, tmp_path):
    run64(ctx64, rng, "R", "N", "N", beta=0.3, m=70, n=50, k=90, blk=32,
          file_backed=True, tmp_path=tmp_path)


def test_extreme_dynamic_range(ctx64, rng):
    """Per-row sigma / per-column tau keep relative accuracy when rows
    and columns span hundreds of orders of magnitude — a flat fp32 or
    single-scale int8 scheme would flush most of the matrix to zero."""
    rows = 10.0 ** rng.uniform(-120, 120, size=37)
    cols = 10.0 ** rng.uniform(-80, 80, size=29)
    run64(ctx64, rng, "R", "N", "N", scale_rows=rows, scale_cols=cols)


def test_multi_flush_overflow_guard(ctx64, rng):
    """k_flush below k forces mid-K int32 plane flushes (the overflow
    guard that large-K runs hit for real); every flush cadence must stay
    within the same near-eps bound vs the golden model."""
    kwargs = dict(m=24, n=20, k=128, blk=16)
    for kf in (16, 64, 10 ** 9):
        run64(ctx64, np.random.default_rng(7), "R", "N", "N",
              k_flush=kf, **kwargs)


def test_zero_and_constant_blocks(ctx64, rng):
    m = n = k = 20
    A = mem_array((m, k), np.float64, "R", data=np.zeros((m, k)), ctx=ctx64)
    B = mem_array((k, n), np.float64, "R",
                  data=np.full((k, n), 3.0), ctx=ctx64)
    C = mem_array((m, n), np.float64, "R", data=np.ones((m, n)), ctx=ctx64)
    gemm(A, B, C, alpha=2.0, beta=5.0, blk=8, ctx=ctx64)
    np.testing.assert_array_equal(C.read_all(), np.full((m, n), 5.0))


def test_split_slices_exactness():
    """The split is an error-free transformation: reconstructing from all
    slices plus the residual weight bound recovers the input to 2^-7s of
    the scale."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((40, 30)) * 10.0 ** rng.uniform(-6, 6, (40, 1))
    sigma = _pow2_scale(np.abs(x).max(axis=1, keepdims=True))
    exps = np.frexp(np.abs(x).max(axis=1, keepdims=True))[1].astype(np.int32)
    s = 8
    q = _split_slices(x, exps, s)
    assert q.dtype == np.int8
    recon = np.zeros_like(x)
    for i in range(s):
        recon += q[i].astype(np.float64) * 2.0 ** (-6 - 7 * i)
    np.testing.assert_allclose(recon * sigma, x,
                               atol=float((2.0 ** -56) * sigma.max()),
                               rtol=0)


def test_exceeds_fp32_accuracy(ctx64, rng):
    """The whole point of the fp64 path: a problem fp32 cannot represent.
    Hilbert-like ill-conditioned sums whose fp32 result is wrong in the
    6th digit come out fp64-accurate."""
    k = 512
    a_np = (1.0 / (1.0 + np.arange(k)))[None, :] * np.ones((8, 1))
    b_np = (1.0 / (1.0 + np.arange(k)))[:, None] * np.ones((1, 8))
    A = mem_array((8, k), np.float64, "R", data=a_np, ctx=ctx64)
    B = mem_array((k, 8), np.float64, "R", data=b_np, ctx=ctx64)
    C = mem_array((8, 8), np.float64, "R", data=np.zeros((8, 8)), ctx=ctx64)
    gemm(A, B, C, blk=64, ctx=ctx64)
    want = a_np @ b_np
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-13)
    f32 = (a_np.astype(np.float32) @ b_np.astype(np.float32))
    assert np.abs(f32 - want).max() > np.abs(C.read_all() - want).max()


def test_aliased_operand(ctx64, rng):
    """A and B backed by the SAME store (C = A @ A): the HBM slice-stack
    cache must not hand a B-role request a stack built with A's per-row
    sigma (the roles split the same bytes with different scale vectors) —
    regression for a silent-wrong-result aliasing bug."""
    n = 16
    a_np = rng.standard_normal((n, n)) * (10.0 ** rng.uniform(
        -40, 40, size=n))[:, None]
    A = mem_array((n, n), np.float64, "R", data=a_np, ctx=ctx64)
    C = mem_array((n, n), np.float64, "R", ctx=ctx64)
    gemm(A, A, C, blk=n, ctx=ctx64)
    want = a_np @ a_np
    scale = (np.abs(a_np).max(axis=1)[:, None]
             * np.abs(a_np).max(axis=0)[None, :])
    err = np.abs(C.read_all() - want) / np.maximum(scale * n, 1e-300)
    assert err.max() < 1e-12, f"max scaled err {err.max():.3e}"


def test_tiled_operands_with_tail(ctx64, rng, tmp_path):
    """Tile-major fp64 operands whose dims are NOT tile multiples: the
    storage layer hands back full zero-padded tiles, which gemm64 must
    slice to the logical region before the amax pre-pass / EFT split
    (regression: broadcast crash in _axis_amax), and the beta read-back
    must tolerate the padded C tile."""
    from bof_tpu import map_tiled_array
    m, n, k, ts = 20, 13, 22, 16
    a_np = rng.standard_normal((m, k))
    b_np = rng.standard_normal((k, n))
    c_np = rng.standard_normal((m, n))
    A = map_tiled_array(str(tmp_path / "a64.t"), (m, k), np.float64,
                        tile=ts, create=True, ctx=ctx64)
    B = map_tiled_array(str(tmp_path / "b64.t"), (k, n), np.float64,
                        tile=ts, create=True, ctx=ctx64)
    C = map_tiled_array(str(tmp_path / "c64.t"), (m, n), np.float64,
                        tile=ts, create=True, ctx=ctx64)
    A.write_block(0, a_np)
    B.write_block(0, b_np)
    C.write_block(0, c_np)
    gemm(A, B, C, beta=0.5, blk=ts, ctx=ctx64)
    want = a_np @ b_np + 0.5 * c_np
    scale = (np.abs(a_np).max(axis=1)[:, None]
             * np.abs(b_np).max(axis=0)[None, :])
    err = (np.abs(C.read_block(0, m, 0, n) - want)
           / np.maximum(scale * k, 1e-300))
    assert err.max() < 1e-12, f"max scaled err {err.max():.3e}"


def test_group_schedule_small_hbm(ctx64, rng):
    """An HBM budget too small to hold one row of slice stacks forces
    multi-group sweeps (jg -> i -> l -> j); results must match the
    single-group path bit-for-bit semantics-wise."""
    old = ctx64.config.hbm_budget
    ctx64.config.hbm_budget = 2 * 8 * 8 * 16 * 16  # a few stacks only
    try:
        run64(ctx64, rng, "R", "N", "T", beta=0.25, m=70, n=60, k=50,
              blk=16)
    finally:
        ctx64.config.hbm_budget = old


def need_devices(n):
    import jax
    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices, have {len(jax.devices())}")


@pytest.mark.parametrize("order,ta,tb", [("R", "N", "N"), ("C", "T", "N"),
                                         ("R", "N", "T"), ("C", "T", "T")])
def test_sharded_gemm64(ctx64, rng, tmp_path, order, ta, tb):
    """Mesh-sharded sliced fp64: int8 slice stacks sharded over the
    8-device mesh, int32 planes psum_scattered — the distributed result
    must hit the same near-eps bound as single-chip (the collectives are
    exact int32 sums)."""
    from bof_tpu.parallel import make_mesh
    from bof_tpu.parallel.mesh import gemm_sharded

    need_devices(8)
    mesh = make_mesh(8)
    ctx64.config.fp64_device = "sliced"
    m, n, k = 37, 29, 41
    a_shape = (k, m) if ta == "T" else (m, k)
    b_shape = (n, k) if tb == "T" else (k, n)
    a_np = (rng.standard_normal(a_shape)
            * 10.0 ** rng.uniform(-25, 25, a_shape[0])[:, None])
    b_np = rng.standard_normal(b_shape)
    c_np = rng.standard_normal((m, n))
    A = map_array(str(tmp_path / "A"), a_shape, np.float64, order,
                  create=True, ctx=ctx64)
    B = map_array(str(tmp_path / "B"), b_shape, np.float64, order,
                  create=True, ctx=ctx64)
    C = map_array(str(tmp_path / "C"), (m, n), np.float64, order,
                  create=True, ctx=ctx64)
    A.write_all(a_np); B.write_all(b_np); C.write_all(c_np)
    gemm_sharded(A, B, C, alpha=1.5, beta=0.5, transa=ta, transb=tb,
                 blk=16, mesh=mesh, ctx=ctx64)
    want = golden(a_np, b_np, c_np, 1.5, 0.5, ta, tb)
    got = C.read_all()
    assert got.dtype == np.float64
    scale = (np.abs(a_np if ta == "N" else a_np.T).max(axis=1)[:, None]
             * np.abs(b_np if tb == "N" else b_np.T).max(axis=0)[None, :])
    err = np.abs(got - want) / np.maximum(scale * k, 1e-300)
    assert err.max() < 1e-12, f"max scaled err {err.max():.3e}"


def test_sharded_gemm64_multiflush(ctx64, rng, tmp_path):
    """k_flush below k on the mesh path: mid-K plane flushes gather the
    sharded int32 planes to the host fold and re-zero them SPMD."""
    from bof_tpu.ops.gemm64 import gemm64
    from bof_tpu.parallel import make_mesh

    need_devices(8)
    mesh = make_mesh(8)
    m, n, k = 24, 20, 128
    a_np = rng.standard_normal((m, k))
    b_np = rng.standard_normal((k, n))
    A = mem_array((m, k), np.float64, "R", data=a_np, ctx=ctx64)
    B = mem_array((k, n), np.float64, "R", data=b_np, ctx=ctx64)
    C = mem_array((m, n), np.float64, "R", ctx=ctx64)
    gemm64(A, B, C, blk=16, ctx=ctx64, k_flush=32, mesh=mesh)
    want = a_np @ b_np
    scale = (np.abs(a_np).max(axis=1)[:, None]
             * np.abs(b_np).max(axis=0)[None, :])
    err = np.abs(C.read_all() - want) / np.maximum(scale * k, 1e-300)
    assert err.max() < 1e-12, f"max scaled err {err.max():.3e}"


def test_native_path_still_default_on_cpu(ctx, rng):
    """fp64_device='auto' on a CPU backend keeps the native x64 path (no
    slicing); outputs match numpy to fp64 matmul accuracy."""
    import jax
    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled in this env")
    run64(ctx, rng, "R", "N", "N")


def test_debug_checks_rejects_nonfinite(ctx64, rng):
    """debug_checks validates operands before the EFT split (reference
    DEBUG builds validate kernel inputs, blas_utils.h:100-141): inf/nan
    would silently corrupt the slicing otherwise."""
    from bof_tpu import mem_array
    ctx64.config.debug_checks = True
    a = rng.standard_normal((20, 20))
    a[3, 7] = np.inf
    A = mem_array((20, 20), np.float64, "R", data=a, ctx=ctx64)
    B = mem_array((20, 20), np.float64, "R",
                  data=rng.standard_normal((20, 20)), ctx=ctx64)
    C = mem_array((20, 20), np.float64, "R", ctx=ctx64)
    with pytest.raises(ValueError, match="non-finite"):
        gemm(A, B, C, blk=16, ctx=ctx64)
    # pin-leak regression: the ValueError fires MID-PIN inside
    # _axis_amax; a leaked pin would leave the tile pinned+poisoned and
    # fail every retry.  After fixing the operand the same arrays must
    # compute cleanly (the poisoned entry was dropped at refs==0).
    a[3, 7] = 1.0
    A.write_all(a)
    gemm(A, B, C, blk=16, ctx=ctx64)
    want = a @ B.read_all()
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-12)


def test_huge_misaligned_scales_no_nan(ctx64):
    """Regression: when A's row scale and B's column scale multiply past
    DBL_MAX (2^601 * 2^601), the final scaling must go through the integer
    exponent sum (ldexp) — materializing sigma*tau gave inf, and inf * a
    truncated-to-zero plane fold produced NaN.  The true values here
    (2.0) sit 2^-1200 below the combined scale, far outside the 2^-7s
    capture window, so the in-model answer is exactly 0 — never NaN."""
    k = 8
    a_np = np.full((4, k), 2.0 ** -600)
    a_np[:, 0] = 2.0 ** 600          # per-row amax 2^600
    b_np = np.full((k, 4), 2.0 ** -600)
    b_np[1, :] = 2.0 ** 600          # per-col amax 2^600, misaligned
    A = mem_array((4, k), np.float64, "R", data=a_np, ctx=ctx64)
    B = mem_array((k, 4), np.float64, "R", data=b_np, ctx=ctx64)
    C = mem_array((4, 4), np.float64, "R", ctx=ctx64)
    gemm64(A, B, C, blk=8, ctx=ctx64)
    got = C.read_all()
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, np.zeros((4, 4)))


def test_huge_aligned_scales_saturate_to_inf(ctx64):
    """When the true product overflows fp64 (aligned 2^600 entries), the
    exponent-sum scaling must saturate to +/-inf exactly like a native
    fp64 computation would — not NaN."""
    k = 8
    a_np = np.full((4, k), 1.0)
    a_np[:, 0] = 2.0 ** 600
    b_np = np.full((k, 4), 1.0)
    b_np[0, :] = 2.0 ** 600          # aligned: C = 2^1200 + ... = inf
    b_np[0, 2] = -(2.0 ** 600)       # sign must survive saturation
    A = mem_array((4, k), np.float64, "R", data=a_np, ctx=ctx64)
    B = mem_array((k, 4), np.float64, "R", data=b_np, ctx=ctx64)
    C = mem_array((4, 4), np.float64, "R", ctx=ctx64)
    gemm64(A, B, C, blk=8, ctx=ctx64)
    got = C.read_all()
    assert np.isposinf(got[:, [0, 1, 3]]).all()
    assert np.isneginf(got[:, 2]).all()


def test_frexp_exponent_1024_splits_exactly(ctx64):
    """amax near DBL_MAX has frexp exponent 1024, where 2^1024 itself is
    inf: the numpy fallback used to divide by that inf and silently zero
    every slice.  ldexp-based splitting keeps the path exact."""
    rng = np.random.default_rng(11)
    k = 16
    a_np = (0.5 + 0.5 * rng.random((8, k))) * 1.0e308   # exp 1024 rows
    b_np = rng.standard_normal((k, 8)) * 2.0 ** -600    # keep C finite
    A = mem_array((8, k), np.float64, "R", data=a_np, ctx=ctx64)
    B = mem_array((k, 8), np.float64, "R", data=b_np, ctx=ctx64)
    C = mem_array((8, 8), np.float64, "R", ctx=ctx64)
    gemm64(A, B, C, blk=8, ctx=ctx64)
    want = a_np @ b_np
    got = C.read_all()
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.parametrize("a_km", [False, True])
@pytest.mark.parametrize("b_nk", [False, True])
@pytest.mark.parametrize("c_nm", [False, True])
def test_slice_accum_diagonal_exact_vs_pairwise(a_km, b_nk, c_nm):
    """The anti-diagonal contraction (one dot per weight plane,
    contracting the plane index AND k together) must be BIT-identical
    to the naive pairwise sum_{i+j=p} A_i@B_j — integer arithmetic has
    one answer regardless of summation structure (no overflow here)."""
    import jax.numpy as jnp

    from bof_tpu.ops.gemm64 import _slice_accum
    rng = np.random.default_rng(41)
    s, m, n, k = 5, 24, 40, 16
    a_shape = (s, k, m) if a_km else (s, m, k)
    b_shape = (s, n, k) if b_nk else (s, k, n)
    a_sl = rng.integers(-64, 65, a_shape).astype(np.int8)
    b_sl = rng.integers(-64, 65, b_shape).astype(np.int8)
    S0 = rng.integers(-1000, 1000,
                      (s, n, m) if c_nm else (s, m, n)).astype(np.int32)
    got = np.asarray(_slice_accum(jnp.asarray(S0), jnp.asarray(a_sl),
                                  jnp.asarray(b_sl), a_km=a_km,
                                  b_nk=b_nk, c_nm=c_nm))
    want = S0.astype(np.int64)
    for p in range(s):
        for i in range(p + 1):
            ai = a_sl[i].T if a_km else a_sl[i]
            bj = b_sl[p - i].T if b_nk else b_sl[p - i]
            prod = ai.astype(np.int64) @ bj.astype(np.int64)
            want[p] += prod.T if c_nm else prod
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_renorm_digits_exact_value_bounds_and_dtypes():
    """The base-2^7 redigitization must encode EXACTLY the same value as
    the raw planes (integer identity, checked in exact rational
    arithmetic via Python ints scaled by 128^(s-1)) with every digit in
    int8 range, including planes at the k_flush magnitude bound 2^30."""
    import jax.numpy as jnp

    from bof_tpu.ops.gemm64 import _renorm_digits
    rng = np.random.default_rng(3)
    s, h, w = 8, 9, 13
    S = rng.integers(-(1 << 30), (1 << 30) + 1, (s, h, w)).astype(np.int32)
    S[0, 0, 0] = (1 << 30)          # exact bound corners
    S[s - 1, 0, 1] = -(1 << 30)
    head, digs = _renorm_digits(s)(jnp.asarray(S))
    head = np.asarray(head)
    digs = np.asarray(digs)
    assert head.dtype == np.int32 and digs.dtype == np.int8
    assert digs.shape == (s - 1, h, w)
    assert digs.min() >= -64 and digs.max() <= 63
    B = 128
    for i in range(h):
        for j in range(w):
            want = sum(int(S[p, i, j]) * B ** (s - 1 - p) for p in range(s))
            got = int(head[i, j]) * B ** (s - 1) + sum(
                int(digs[p, i, j]) * B ** (s - 2 - p) for p in range(s - 1))
            assert got == want


def test_digit_flush_matches_plane_flush(ctx64, monkeypatch):
    """Digit-renormalized D2H vs raw int32 planes: same decomposition
    value, so the folded C must agree to fp64 rounding (the summands
    differ, so bit-identity is not promised — the scaled-error bound is
    the contract both modes meet; multi-flush path included)."""
    rng = np.random.default_rng(11)
    run64(ctx64, rng, "R", "N", "N", m=33, n=21, k=64, blk=16,
          k_flush=32, scale_rows=np.logspace(-8, 8, 33))
    monkeypatch.setenv("BOF_NO_PLANE_DIGITS", "1")
    run64(ctx64, np.random.default_rng(11), "R", "N", "N", m=33, n=21,
          k=64, blk=16, k_flush=32, scale_rows=np.logspace(-8, 8, 33))
