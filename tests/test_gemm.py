"""Differential tests for out-of-core GEMM.

Port of the reference's gemm correctness harness (reference:
misc/gemm_run.sh — random fp32 matrices, all 8 {N,T}x{N,T}x{R,C} configs,
outputs compared against the in-memory golden model by max relative
error).  Golden model is float64 numpy, compared at fp32 tolerance.
Block size is forced tiny so every run exercises multi-block scheduling,
padding, accumulate chains, and write-back.
"""
import itertools

import numpy as np
import pytest

from bof_tpu import mem_array, map_array
from bof_tpu.ops import gemm, gemm_in_mem


def golden(a, b, c, alpha, beta, ta, tb):
    opa = a.T if ta == "T" else a
    opb = b.T if tb == "T" else b
    out = alpha * (opa.astype(np.float64) @ opb.astype(np.float64))
    if beta != 0.0:
        out = out + beta * c.astype(np.float64)
    return out.astype(np.float32)


def run_config(ctx, rng, order, ta, tb, alpha=1.5, beta=0.0,
               m=37, n=29, k=41, blk=16, file_backed=False, tmp_path=None,
               mixed_orders=None):
    a_shape = (k, m) if ta == "T" else (m, k)
    b_shape = (n, k) if tb == "T" else (k, n)
    a_np = rng.standard_normal(a_shape).astype(np.float32)
    b_np = rng.standard_normal(b_shape).astype(np.float32)
    c_np = rng.standard_normal((m, n)).astype(np.float32)

    orders = mixed_orders or (order, order, order)
    if file_backed:
        A = map_array(str(tmp_path / "A.bin"), a_shape, np.float32,
                      orders[0], create=True, ctx=ctx)
        B = map_array(str(tmp_path / "B.bin"), b_shape, np.float32,
                      orders[1], create=True, ctx=ctx)
        C = map_array(str(tmp_path / "C.bin"), (m, n), np.float32,
                      orders[2], create=True, ctx=ctx)
        for arr, data in ((A, a_np), (B, b_np), (C, c_np)):
            arr.write_all(data)
    else:
        A = mem_array(a_shape, np.float32, orders[0], data=a_np, ctx=ctx)
        B = mem_array(b_shape, np.float32, orders[1], data=b_np, ctx=ctx)
        C = mem_array((m, n), np.float32, orders[2], data=c_np, ctx=ctx)

    gemm(A, B, C, alpha=alpha, beta=beta, transa=ta, transb=tb,
         blk=blk, ctx=ctx)
    got = C.read_all()
    want = golden(a_np, b_np, c_np, alpha, beta, ta, tb)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("order,ta,tb",
                         list(itertools.product("RC", "NT", "NT")))
def test_all_eight_configs(ctx, rng, order, ta, tb):
    run_config(ctx, rng, order, ta, tb, beta=0.0)


@pytest.mark.parametrize("order,ta,tb", [("R", "N", "N"), ("C", "T", "T")])
def test_beta_accumulate(ctx, rng, order, ta, tb):
    run_config(ctx, rng, order, ta, tb, alpha=0.75, beta=0.6)


def test_file_backed_multiblock(ctx, rng, tmp_path):
    run_config(ctx, rng, "R", "N", "N", beta=0.3, m=100, n=90, k=110,
               blk=32, file_backed=True, tmp_path=tmp_path)


def test_mixed_layouts(ctx, rng):
    run_config(ctx, rng, "R", "N", "T", beta=0.5,
               mixed_orders=("R", "C", "C"))


def test_block_evenly_divides(ctx, rng):
    run_config(ctx, rng, "R", "T", "N", m=64, n=32, k=48, blk=16)


def test_single_block(ctx, rng):
    run_config(ctx, rng, "C", "N", "N", m=8, n=8, k=8, blk=16)


def test_in_mem_golden_matches_numpy(rng):
    a = rng.standard_normal((31, 17)).astype(np.float32)
    b = rng.standard_normal((17, 23)).astype(np.float32)
    got = gemm_in_mem(a, b, alpha=2.0)
    np.testing.assert_allclose(
        got, 2.0 * (a.astype(np.float64) @ b.astype(np.float64)),
        rtol=2e-5, atol=1e-5)


def test_shape_validation(ctx, rng):
    A = mem_array((4, 5), np.float32, ctx=ctx)
    B = mem_array((6, 7), np.float32, ctx=ctx)
    C = mem_array((4, 7), np.float32, ctx=ctx)
    with pytest.raises(ValueError):
        gemm(A, B, C, ctx=ctx)


def test_grouped_schedule_small_hbm(ctx, rng):
    """Force G=1 groups (tiny HBM budget): operands >> HBM-tier budget."""
    ctx.config.hbm_budget = 1  # forces minimum group width and LRU churn
    ctx.config.pipeline_depth = 2
    run_config(ctx, rng, "R", "N", "N", beta=0.4, m=80, n=96, k=64, blk=16)


def test_gemm_bfloat16_transfer_mode(ctx, rng):
    """transfer_dtype='bfloat16' halves the A/B link bytes: results match
    within bf16 input-rounding error while the accumulator stays fp32."""
    from bof_tpu import mem_array
    from bof_tpu.ops import gemm
    ctx.config.transfer_dtype = "bfloat16"
    try:
        m, n, k = 96, 80, 112
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((k, n)).astype(np.float32)
        A = mem_array((m, k), np.float32, data=a, ctx=ctx)
        B = mem_array((k, n), np.float32, data=b, ctx=ctx)
        C = mem_array((m, n), np.float32, ctx=ctx)
        gemm(A, B, C, blk=64, ctx=ctx)
        want = a.astype(np.float64) @ b.astype(np.float64)
        got = C.read_all().astype(np.float64)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 2e-2, rel          # bf16 input rounding band
        assert rel > 1e-6               # and it really did round (not fp32)
    finally:
        ctx.config.transfer_dtype = "float32"


def test_gemm_bf16_c_transfer_mode(ctx, rng):
    """c_transfer_dtype='bfloat16' halves the C D2H bytes: the K
    accumulation stays fp32 and only the final download rounds once, so
    the error is a single bf16 output rounding — much tighter than the
    bf16 INPUT mode's band.  Composes with transfer_dtype='int8'."""
    from bof_tpu import mem_array
    from bof_tpu.ops import gemm
    from bof_tpu.utils import METRICS
    ctx.config.c_transfer_dtype = "bfloat16"
    try:
        m, n, k = 96, 80, 112
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((k, n)).astype(np.float32)
        c0 = rng.standard_normal((m, n)).astype(np.float32)
        A = mem_array((m, k), np.float32, data=a, ctx=ctx)
        B = mem_array((k, n), np.float32, data=b, ctx=ctx)
        C = mem_array((m, n), np.float32, data=c0, ctx=ctx)
        before = METRICS.snapshot().get("gemm.d2h_bytes", 0)
        gemm(A, B, C, beta=0.5, blk=64, ctx=ctx)
        after = METRICS.snapshot().get("gemm.d2h_bytes", 0)
        want = a.astype(np.float64) @ b.astype(np.float64) \
            + 0.5 * c0.astype(np.float64)
        got = C.read_all().astype(np.float64)
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-2, rel          # one bf16 output rounding
        assert rel > 1e-7               # and it really did round
        # link accounting: D2H shipped 2-byte elements, not 4
        assert after - before == m * n * 2

        # composes with int8 A/B transfer: output rounding is noise
        # next to the int8 input rounding band
        ctx.config.transfer_dtype = "int8"
        C2 = mem_array((m, n), np.float32, ctx=ctx)
        gemm(A, B, C2, blk=64, ctx=ctx)
        want2 = a.astype(np.float64) @ b.astype(np.float64)
        rel2 = np.abs(C2.read_all() - want2).max() / np.abs(want2).max()
        assert rel2 < 5e-2, rel2
    finally:
        ctx.config.c_transfer_dtype = "float32"
        ctx.config.transfer_dtype = "float32"


def test_telemetry_sync_mode(ctx, rng):
    """telemetry_sync=True routes every transfer through the channel lock
    with an in-window sync: results identical, and per-tile rate samples +
    accum_wait/d2h split are recorded (bench truth mode, VERDICT r2 #2)."""
    from bof_tpu.utils import METRICS
    ctx.config.telemetry_sync = True
    try:
        before = METRICS.snapshot()
        n_h2d = len(METRICS.samples("gemm.h2d_tile_gbps"))
        n_d2h = len(METRICS.samples("gemm.d2h_tile_gbps"))
        run_config(ctx, rng, "R", "N", "N", beta=0.5, m=40, n=36, k=44,
                   blk=16)
        after = METRICS.snapshot()
        h2d_tiles = METRICS.samples("gemm.h2d_tile_gbps")[n_h2d:]
        d2h_tiles = METRICS.samples("gemm.d2h_tile_gbps")[n_d2h:]
        assert h2d_tiles and all(s > 0 for s in h2d_tiles)
        assert d2h_tiles and all(s > 0 for s in d2h_tiles)
        # the synced windows must have recorded real (nonzero) stage time
        assert after.get("gemm.h2d_s", 0) > before.get("gemm.h2d_s", 0)
        assert after.get("gemm.d2h_s", 0) > before.get("gemm.d2h_s", 0)
        assert "gemm.accum_wait_s" in after
    finally:
        ctx.config.telemetry_sync = False


def test_gemm_int8_transfer_mode(ctx, rng):
    """transfer_dtype='int8' quarters the A/B link bytes: per-tile
    max-abs quantization on the host, exact int8 MXU products, one f32
    rescale per tile.  Error is bounded by input rounding; transposes,
    layouts, alpha/beta and ragged tails all still work."""
    from bof_tpu import mem_array
    from bof_tpu.ops import gemm
    from bof_tpu.utils import METRICS
    ctx.config.transfer_dtype = "int8"
    try:
        for order, ta, tb, beta in (("R", "N", "N", 0.0),
                                    ("C", "T", "N", 0.5),
                                    ("R", "N", "T", 0.0)):
            m, n, k = 96, 80, 112
            a_shape = (k, m) if ta == "T" else (m, k)
            b_shape = (n, k) if tb == "T" else (k, n)
            a = rng.standard_normal(a_shape).astype(np.float32)
            b = rng.standard_normal(b_shape).astype(np.float32)
            c0 = rng.standard_normal((m, n)).astype(np.float32)
            A = mem_array(a_shape, np.float32, order, data=a, ctx=ctx)
            B = mem_array(b_shape, np.float32, order, data=b, ctx=ctx)
            C = mem_array((m, n), np.float32, order, data=c0, ctx=ctx)
            before = METRICS.snapshot().get("gemm.h2d_bytes", 0)
            gemm(A, B, C, alpha=1.25, beta=beta, transa=ta, transb=tb,
                 blk=64, ctx=ctx)
            opa = (a.T if ta == "T" else a).astype(np.float64)
            opb = (b.T if tb == "T" else b).astype(np.float64)
            want = 1.25 * (opa @ opb) + beta * c0.astype(np.float64)
            got = C.read_all().astype(np.float64)
            rel = np.abs(got - want).max() / np.abs(want).max()
            assert rel < 5e-2, (order, ta, tb, rel)  # int8 rounding band
            assert rel > 1e-6, "really quantized (not fp32)"
        # link accounting: int8 tiles are 1/4 the fp32 bytes (1B vs 4B)
        after = METRICS.snapshot().get("gemm.h2d_bytes", 0)
        assert after > before
    finally:
        ctx.config.transfer_dtype = "float32"


def test_gemm_rejects_output_aliasing_input(ctx, tmp_path, rng):
    """C aliasing A/B bytes (same store or the same file opened twice)
    would let the writer clobber tiles the producer still reads."""
    from bof_tpu import map_array
    m = 64
    a_np = rng.standard_normal((m, m)).astype(np.float32)
    p = str(tmp_path / "ab.bin")
    A = map_array(p, (m, m), np.float32, "R", create=True, ctx=ctx)
    A.write_all(a_np)
    B = mem_array((m, m), np.float32, data=a_np, ctx=ctx)
    C = map_array(p, (m, m), np.float32, "R", ctx=ctx)  # same file!
    with pytest.raises(ValueError, match="alias"):
        gemm(A, B, C, blk=32, ctx=ctx)
    # disjoint ranges of one file are fine
    big = map_array(str(tmp_path / "big.bin"), (2 * m, m), np.float32,
                    "R", create=True, ctx=ctx)
    from bof_tpu.core.flash_array import FlashArray
    A2 = FlashArray(big.store, (m, m), np.float32, "R", offset=0, ctx=ctx)
    C2 = FlashArray(big.store, (m, m), np.float32, "R",
                    offset=m * m * 4, ctx=ctx)
    A2.write_all(a_np)
    gemm(A2, B, C2, blk=32, ctx=ctx)
    np.testing.assert_allclose(C2.read_all(), a_np @ a_np,
                               rtol=2e-4, atol=1e-4)
