"""Executes a scaled-down version of README.md's quick start: every name
and call shape the README shows must exist and work, so the documented
public API can't drift from the implementation."""
import numpy as np
import pytest
import scipy.sparse as sps

# ~200s: a broad end-to-end sweep of every README name at toy size; the
# fast default suite covers the same API through the per-kernel tests
# (opt in with BOF_SLOW=1, see tests/conftest.py)
pytestmark = pytest.mark.slow


def test_readme_quickstart_api(tmp_path, rng):
    import jax.numpy as jnp

    import bof_tpu as bt

    ctx = bt.flash_setup(str(tmp_path / "scratch"))
    try:
        n = 64
        for name, seed in (("A", 1), ("B", 2)):
            (tmp_path / f"{name}.bin").write_bytes(
                np.random.default_rng(seed).standard_normal(n * n)
                .astype(np.float32).tobytes())
        A = bt.map_array(str(tmp_path / "A.bin"), (n, n), np.float32, "R",
                         ctx=ctx)
        B = bt.map_array(str(tmp_path / "B.bin"), (n, n), np.float32, "R",
                         ctx=ctx)
        C = bt.map_array(str(tmp_path / "C.bin"), (n, n), np.float32, "R",
                         create=True, ctx=ctx)
        bt.gemm(A, B, C, alpha=1.0, beta=0.0)
        np.testing.assert_allclose(
            C.read_all(),
            A.read_all().astype(np.float64) @ B.read_all(),
            rtol=2e-4, atol=1e-3)

        a_sp = sps.random(96, n, density=0.1, format="csr",
                          dtype=np.float32,
                          random_state=np.random.RandomState(0))
        S = bt.CsrFlashMatrix.from_scipy(a_sp, backing="file",
                                         path_prefix=str(tmp_path / "bow"),
                                         ctx=ctx)
        S = bt.CsrFlashMatrix.map_files(str(tmp_path / "bow"),
                                        shape=(96, n), ctx=ctx)
        C2 = bt.mem_array((96, n), np.float32, ctx=ctx)
        bt.csrmm(S, B, C2)
        x = rng.standard_normal(n).astype(np.float32)
        y = bt.csrgemv(S, x)
        np.testing.assert_allclose(y, a_sp @ x, rtol=1e-3, atol=1e-3)

        src = bt.mem_array((4096,), np.float32, ctx=ctx,
                           data=np.abs(rng.standard_normal(4096))
                           .astype(np.float32))
        dst = bt.mem_array((4096,), np.float32, ctx=ctx)
        bt.bof_sort(src, dst, ctx=ctx)
        bt.bof_map(src, dst, jnp.sqrt, ctx=ctx)
        s = bt.bof_reduce(dst, "sum", ctx=ctx)
        assert np.isfinite(s)

        points = bt.mem_array((512, 8), np.float32, ctx=ctx,
                              data=rng.standard_normal((512, 8))
                              .astype(np.float32))
        centers, inertia = bt.kmeans_fit(points, n_centers=4, n_iters=3,
                                         ctx=ctx)
        assert centers.shape == (4, 8) and np.isfinite(inertia)

        from bof_tpu.apps import block_lanczos_svd, topic_model, xml_rank
        sigma, V = block_lanczos_svd(S, n_vals=2, ctx=ctx)
        assert sigma.shape == (2,) and V.shape == (n, 2)
        topics, labels = topic_model(S, n_topics=2, proj_dim=8, n_iters=2,
                                     ctx=ctx)
        W = bt.mem_array((10, n), np.float32, ctx=ctx,
                         data=rng.standard_normal((10, n))
                         .astype(np.float32))
        scores, labels = xml_rank(S, W, k=3, ctx=ctx)
        assert scores.shape == (96, 3)

        from bof_tpu.parallel import (csrmm_sharded, gemm_sharded,
                                      kmeans_fit_sharded, make_mesh)
        mesh = make_mesh()
        gemm_sharded(A, B, C, mesh=mesh, ctx=ctx)
        csrmm_sharded(S, B, C2, mesh=mesh, ctx=ctx)
        kmeans_fit_sharded(points, 4, n_iters=2, mesh=mesh, ctx=ctx)
    finally:
        bt.flash_destroy()
