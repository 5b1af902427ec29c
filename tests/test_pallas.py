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
