"""TiledFlashArray: tile-major storage layout (core/tiled_array.py).

Extension beyond the reference (its files are flat, misc/dense_create.cpp):
each (ts x ts) zero-padded tile is contiguous on disk, so kernel
superblock reads are single sequential runs.  Differential tests: repack
round-trip, general-window read/write vs a numpy model, and gemm over
tiled operands vs the flat-path golden on ragged shapes, transposes, and
beta.
"""
import numpy as np
import pytest

from bof_tpu import (FlashArray, TiledFlashArray, map_array,
                     map_tiled_array, mem_array)
from bof_tpu.core.tiled_array import repack, unpack
from bof_tpu.io.store import MemStore


def _mem_tiled(shape, dtype=np.float32, order="R", tile=16, ctx=None):
    m, n = shape
    ts = tile
    nbytes = (-(-m // ts)) * (-(-n // ts)) * ts * ts * np.dtype(dtype).itemsize
    return TiledFlashArray(MemStore(nbytes), shape, dtype, order,
                           tile=ts, ctx=ctx)


@pytest.mark.parametrize("order", ["R", "C"])
@pytest.mark.parametrize("shape", [(32, 48), (33, 47), (16, 16), (7, 70)])
def test_repack_roundtrip(ctx, rng, order, shape):
    data = rng.standard_normal(shape).astype(np.float32)
    flat = mem_array(shape, np.float32, order, data=data, ctx=ctx)
    tiled = _mem_tiled(shape, order=order, tile=16, ctx=ctx)
    repack(flat, tiled)
    np.testing.assert_array_equal(tiled.read_all(), data)
    back = mem_array(shape, np.float32, order, ctx=ctx)
    unpack(tiled, back)
    np.testing.assert_array_equal(back.read_all(), data)


@pytest.mark.parametrize("order", ["R", "C"])
def test_general_windows(ctx, rng, order):
    shape = (45, 37)
    data = rng.standard_normal(shape).astype(np.float32)
    tiled = _mem_tiled(shape, order=order, tile=16, ctx=ctx)
    tiled.write_block(0, data)
    # random unaligned windows crossing tile boundaries
    for _ in range(12):
        r0 = int(rng.integers(0, shape[0] - 1))
        c0 = int(rng.integers(0, shape[1] - 1))
        nr = int(rng.integers(1, shape[0] - r0 + 1))
        nc = int(rng.integers(1, shape[1] - c0 + 1))
        np.testing.assert_array_equal(tiled.read_block(r0, nr, c0, nc),
                                      data[r0:r0 + nr, c0:c0 + nc])
    # read-modify-write of an unaligned window
    patch = rng.standard_normal((20, 21)).astype(np.float32)
    tiled.write_block(9, patch, 5)
    data[9:29, 5:26] = patch
    np.testing.assert_array_equal(tiled.read_all(), data)


def test_access_contract(ctx, rng):
    tiled = _mem_tiled((32, 32), tile=16, ctx=ctx)
    with pytest.raises(ValueError):
        tiled.block_access(8, 16, 0, 16)   # unaligned row
    with pytest.raises(ValueError):
        tiled.block_access(0, 32, 0, 16)   # spans two tiles
    off, sinfo = tiled.block_access(16, 16, 16, 16)
    assert sinfo.n_strides == 1            # one contiguous run
    assert sinfo.len_per_stride == 16 * 16 * 4
    with pytest.raises(TypeError):
        tiled.as_memmap()
    with pytest.raises(TypeError):
        tiled.ravel_view()


@pytest.mark.parametrize("order,ta,tb,beta", [
    ("R", "N", "N", 0.0),
    ("R", "N", "N", 0.7),
    ("C", "N", "N", 0.0),
    ("R", "T", "N", 0.0),
    ("R", "N", "T", 0.5),
    ("C", "T", "T", 0.0),
])
def test_gemm_tiled_operands(ctx, rng, order, ta, tb, beta):
    """gemm over tile-major operands matches the flat-path golden —
    ragged tails exercise the zero-padded tile machinery end-to-end."""
    from bof_tpu.ops import gemm
    m, n, k, blk = 40, 36, 44, 16
    a_shape = (k, m) if ta == "T" else (m, k)
    b_shape = (n, k) if tb == "T" else (k, n)
    a = rng.standard_normal(a_shape).astype(np.float32)
    b = rng.standard_normal(b_shape).astype(np.float32)
    c0 = rng.standard_normal((m, n)).astype(np.float32)
    A = _mem_tiled(a_shape, order=order, tile=blk, ctx=ctx)
    B = _mem_tiled(b_shape, order=order, tile=blk, ctx=ctx)
    C = _mem_tiled((m, n), order=order, tile=blk, ctx=ctx)
    A.write_block(0, a)
    B.write_block(0, b)
    C.write_block(0, c0)
    gemm(A, B, C, alpha=1.25, beta=beta, transa=ta, transb=tb,
         blk=blk, ctx=ctx)
    opa = (a.T if ta == "T" else a).astype(np.float64)
    opb = (b.T if tb == "T" else b).astype(np.float64)
    want = 1.25 * (opa @ opb) + beta * c0.astype(np.float64)
    got = C.read_all().astype(np.float64)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-4, rel


def test_gemm_mixed_flat_tiled(ctx, rng):
    """Tiled and flat operands mix freely (per-operand access specs)."""
    from bof_tpu.ops import gemm
    m, n, k, blk = 33, 18, 26, 16
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    A = _mem_tiled((m, k), tile=blk, ctx=ctx)
    A.write_block(0, a)
    B = mem_array((k, n), np.float32, data=b, ctx=ctx)
    C = mem_array((m, n), np.float32, ctx=ctx)
    gemm(A, B, C, blk=blk, ctx=ctx)
    want = a.astype(np.float64) @ b.astype(np.float64)
    rel = np.abs(C.read_all() - want).max() / np.abs(want).max()
    assert rel < 2e-4, rel


def test_gemm_blk_mismatch_raises(ctx, rng):
    from bof_tpu.ops import gemm
    A = _mem_tiled((32, 32), tile=16, ctx=ctx)
    B = mem_array((32, 32), np.float32, ctx=ctx)
    C = mem_array((32, 32), np.float32, ctx=ctx)
    with pytest.raises(ValueError, match="tile-major"):
        gemm(A, B, C, blk=32, ctx=ctx)


def test_map_tiled_array_file(ctx, rng, tmp_path):
    """File-backed tiled arrays: padded grid sizing + persistence through
    the native store path."""
    shape = (45, 37)
    data = rng.standard_normal(shape).astype(np.float32)
    path = str(tmp_path / "tiled.bin")
    T = map_tiled_array(path, shape, np.float32, tile=16, create=True,
                        ctx=ctx)
    T.write_block(0, data)
    T.store.flush()
    import os
    assert os.path.getsize(path) == 3 * 3 * 16 * 16 * 4
    T2 = map_tiled_array(path, shape, np.float32, tile=16, ctx=ctx)
    np.testing.assert_array_equal(T2.read_all(), data)


@pytest.mark.parametrize("mode", ["device", "host"])
def test_csrmm_tiled_dense_operands(ctx, rng, mode):
    """csrmm over tile-major B and C matches the flat run — the adaptive
    row blocks go through the general-window tile paths (sparse/csrmm.py;
    reference csrmm is flat-only, csrmm.cpp:64-126)."""
    import scipy.sparse as sps

    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    ctx.config.max_nnzs = 2048
    ctx.config.csrmm_cblk_size = 32
    ctx.config.sparse_compute = mode
    m, k, n, ts = 300, 200, 70, 64
    a_sp = sps.random(m, k, density=0.03, format="csr", dtype=np.float32,
                      random_state=3)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    c_np = rng.standard_normal((m, n)).astype(np.float32)
    B = _mem_tiled((k, n), tile=ts, ctx=ctx)
    C = _mem_tiled((m, n), tile=ts, ctx=ctx)
    B.write_block(0, b_np)
    C.write_block(0, c_np)
    csrmm(A, B, C, alpha=1.5, beta=0.5, ctx=ctx)
    want = 1.5 * (a_sp @ b_np) + 0.5 * c_np
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-4, atol=1e-4)


def test_csrmm_tiled_k_split(ctx, rng):
    """K-range splitting accumulates into tiled C (RMW tile writes under
    the range barrier)."""
    import scipy.sparse as sps

    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    ctx.config.max_nnzs = 1024
    ctx.config.csrmm_cblk_size = 16
    ctx.config.hbm_budget = 3 * 4096 * 16 * 4
    m, k, n, ts = 150, 10_000, 24, 64
    a_sp = sps.random(m, k, density=0.003, format="csr", dtype=np.float32,
                      random_state=4)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    c_np = rng.standard_normal((m, n)).astype(np.float32)
    B = _mem_tiled((k, n), tile=ts, ctx=ctx)
    C = _mem_tiled((m, n), tile=ts, ctx=ctx)
    B.write_block(0, b_np)
    C.write_block(0, c_np)
    csrmm(A, B, C, alpha=1.25, beta=0.5, ctx=ctx)
    want = 1.25 * (a_sp @ b_np) + 0.5 * c_np
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-4, atol=1e-4)


def test_csrmm_trans_tiled(ctx, rng):
    """'T' streaming path reads tiled B / writes tiled C via the general
    windows."""
    import scipy.sparse as sps

    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    ctx.config.sparse_compute = "host"
    m, k, n, ts = 200, 150, 40, 64
    a_sp = sps.random(m, k, density=0.03, format="csr", dtype=np.float32,
                      random_state=5)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b_np = rng.standard_normal((m, n)).astype(np.float32)
    B = _mem_tiled((m, n), tile=ts, ctx=ctx)
    C = _mem_tiled((k, n), tile=ts, ctx=ctx)
    B.write_block(0, b_np)
    C.write_block(0, np.zeros((k, n), np.float32))
    csrmm(A, B, C, transa="T", ctx=ctx)
    want = a_sp.T @ b_np
    np.testing.assert_allclose(C.read_all(), want, rtol=1e-4, atol=1e-4)


def test_gemm_sharded_tiled_operands(ctx, rng):
    """Single-host gemm_sharded over tile-major operands (tile == the
    lcm-rounded blk) matches the numpy golden; mismatched tiles raise."""
    import jax

    from bof_tpu.parallel import gemm_sharded, make_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8)
    m, n, k, blk = 96, 80, 112, 32  # lcm(4,2)=4 divides 32: no rounding
    a_np = rng.standard_normal((m, k)).astype(np.float32)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    A = _mem_tiled((m, k), tile=blk, ctx=ctx)
    B = _mem_tiled((k, n), tile=blk, ctx=ctx)
    C = _mem_tiled((m, n), tile=blk, ctx=ctx)
    A.write_block(0, a_np)
    B.write_block(0, b_np)
    gemm_sharded(A, B, C, blk=blk, mesh=mesh, ctx=ctx)
    want = a_np.astype(np.float64) @ b_np.astype(np.float64)
    np.testing.assert_allclose(C.read_all(), want.astype(np.float32),
                               rtol=2e-4, atol=1e-4)
    with pytest.raises(ValueError, match="tile-major"):
        gemm_sharded(A, B, C, blk=16, mesh=mesh, ctx=ctx)


def test_tiled_partial_window_write_rejected(ctx, rng):
    """A storage write whose partial window is NOT the tile's full
    logical extent must be a loud error: _coerce_tile zero-pads the rest
    of the tile, which would destroy the co-resident rows a caller at an
    nnz-adaptive boundary (e.g. csrmm_sharded) does not own."""
    T = _mem_tiled((100, 40), tile=64, ctx=ctx)
    want = rng.standard_normal((100, 40)).astype(np.float32)
    T.write_all(want)
    # legal: the grid-edge tail block (rows 64..99 of tile row 1)
    tail = rng.standard_normal((36, 40)).astype(np.float32)
    T.write_block_storage(64, 0, 36, 40, tail)
    want[64:] = tail
    np.testing.assert_array_equal(T.read_all(), want)
    # illegal: an interior partial window (rows 0..29 of tile row 0) —
    # zero-padding would wipe rows 30..63
    with pytest.raises(ValueError, match="full logical extent"):
        T.write_block_storage(0, 0, 30, 40,
                              np.zeros((30, 40), np.float32))
    np.testing.assert_array_equal(T.read_all(), want)  # untouched
