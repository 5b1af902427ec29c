"""Pallas MXU matmul kernel tests (interpret mode on the CPU mesh; the
compiled path is exercised on real TPU by bench.py and the verify drives)."""
import numpy as np

from bof_tpu.ops.matmul_pallas import matmul


def test_pallas_matmul_interpret(rng):
    import jax.numpy as jnp
    m, k, n = 256, 128, 256
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    got = np.asarray(matmul(jnp.asarray(a), jnp.asarray(b),
                            bm=128, bn=128, bk=64, interpret=True))
    want = a.astype(np.float64) @ b.astype(np.float64)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-5,
                               atol=1e-4)


def test_pallas_accum_step_integration(rng):
    """accum_step with impl='pallas' (canonical layout) must agree with
    the XLA path."""
    import jax.numpy as jnp
    from bof_tpu.ops.device import accum_step
    bm = bk = bn = 128
    a = rng.standard_normal((bm, bk)).astype(np.float32)
    b = rng.standard_normal((bk, bn)).astype(np.float32)
    c = rng.standard_normal((bm, bn)).astype(np.float32)
    kw = dict(a_km=False, b_nk=False, c_nm=False, prec="highest")
    ref = np.asarray(accum_step(jnp.asarray(c), jnp.asarray(a),
                                jnp.asarray(b), np.float32(1.5),
                                impl="xla", **kw))
    # pallas falls back to interpret-compatible path only on TPU; on CPU
    # the kernel runs via interpret inside matmul when requested — here we
    # only verify the xla path composes; the device parity test runs on
    # hardware.  Still, the call must not crash when impl='pallas' is
    # requested off-TPU (it uses the pallas kernel in compiled mode, which
    # CPU pallas supports for simple kernels).
    import jax
    if jax.default_backend() == "tpu":
        got = np.asarray(accum_step(jnp.asarray(c), jnp.asarray(a),
                                    jnp.asarray(b), np.float32(1.5),
                                    impl="pallas", **kw))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
    else:
        assert ref.shape == (bm, bn)


def _random_ell(rng, rows, k, max_nnz_per_row):
    from bof_tpu.sparse.spmm_device import to_ell
    counts = rng.integers(0, max_nnz_per_row + 1, rows)
    ia = np.zeros(rows + 1, np.int64)
    np.cumsum(counts, out=ia[1:])
    nnz = int(ia[-1])
    ja = rng.integers(0, k, nnz, dtype=np.int64)
    va = rng.standard_normal(nnz).astype(np.float32)
    return to_ell(ia, ja, va), (ia, ja, va)


def test_pallas_spmm_ell_interpret(rng):
    """Pallas VMEM-gather SpMM vs the XLA take+reduce kernel, over ragged
    blocks that exercise padding rows/slots and both unroll widths."""
    import jax.numpy as jnp
    from bof_tpu.sparse.spmm_device import spmm_ell_block
    from bof_tpu.sparse.spmm_pallas import spmm_ell_pallas
    for rows, k, cb, mr in ((64, 256, 128, 20),   # rmax pow2: unroll 8/4
                            (24, 128, 128, 3),    # rmax=4: unroll 4
                            (16, 128, 256, 1)):   # rmax=1: unroll 1
        (ja_ell, va_ell), _ = _random_ell(rng, rows, k, mr)
        b = rng.standard_normal((k, cb)).astype(np.float32)
        want = np.asarray(spmm_ell_block(jnp.asarray(b), jnp.asarray(ja_ell),
                                         jnp.asarray(va_ell)))
        got = np.asarray(spmm_ell_pallas(jnp.asarray(b),
                                         jnp.asarray(ja_ell),
                                         jnp.asarray(va_ell),
                                         interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spmm_dispatch_routing(rng):
    """'auto' never picks pallas (re-measured r3: XLA wins every rmax on
    v5e); explicit 'pallas' is gated by the hard feasibility limits."""
    from bof_tpu.sparse.spmm_pallas import pallas_eligible, pallas_feasible
    assert not pallas_eligible(k=4096, cb=512, rmax=32, rows=64)
    assert pallas_feasible(k=4096, cb=512, rmax=32, rows=64)
    assert not pallas_feasible(k=16384, cb=4096, rmax=32, rows=64)  # VMEM
    assert not pallas_feasible(k=4096, cb=500, rmax=32, rows=64)   # lanes
    assert not pallas_feasible(k=4096, cb=512, rmax=32, rows=30)   # rows%8
    # dispatch runs (CPU backend: auto -> xla) and matches
    import jax.numpy as jnp
    from bof_tpu.sparse.spmm_device import (spmm_ell_block,
                                            spmm_ell_block_dispatch)
    (ja_ell, va_ell), _ = _random_ell(rng, 32, 128, 6)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    want = np.asarray(spmm_ell_block(jnp.asarray(b), jnp.asarray(ja_ell),
                                     jnp.asarray(va_ell)))
    got = np.asarray(spmm_ell_block_dispatch(
        jnp.asarray(b), jnp.asarray(ja_ell), jnp.asarray(va_ell),
        impl="auto"))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pallas_matmul_layout_general_interpret(rng):
    """All 8 storage-layout configs (a_km, b_nk, c_nm) through the MXU
    kernel's in-kernel dot_general transposes (interpret mode)."""
    import itertools
    import numpy as np
    from bof_tpu.ops.matmul_pallas import matmul
    m, n, k = 256, 128, 128
    a_log = rng.standard_normal((m, k)).astype(np.float32)
    b_log = rng.standard_normal((k, n)).astype(np.float32)
    want = a_log.astype(np.float64) @ b_log.astype(np.float64)
    for a_km, b_nk, c_nm in itertools.product([False, True], repeat=3):
        a_st = np.ascontiguousarray(a_log.T) if a_km else a_log
        b_st = np.ascontiguousarray(b_log.T) if b_nk else b_log
        got = np.asarray(matmul(a_st, b_st, bm=128, bn=128, bk=64,
                                a_km=a_km, b_nk=b_nk, c_nm=c_nm,
                                interpret=True))
        if c_nm:
            got = got.T
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=2e-4, atol=1e-3,
                                   err_msg=f"{a_km} {b_nk} {c_nm}")


def test_pallas_spmm_unroll_partials_interpret(rng):
    """The independent-partial slot accumulation must stay exact for
    deep ELL blocks (rmax 128 — past the old crossover)."""
    import numpy as np
    from bof_tpu.sparse.spmm_pallas import spmm_ell_pallas
    rows, rmax, k, cb = 16, 128, 512, 128
    ja = rng.integers(0, k, (rows, rmax)).astype(np.int32)
    va = rng.standard_normal((rows, rmax)).astype(np.float32)
    va[:, 100:] = 0.0  # padding slots
    b = rng.standard_normal((k, cb)).astype(np.float32)
    got = np.asarray(spmm_ell_pallas(b, ja, va, interpret=True))
    want = np.einsum("rs,rsc->rc", va, b[ja])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)
