"""REAL multi-host data plane: two `jax.distributed` processes.

Round-2 verdict: the multihost branches (sharded reads, multihost
device_put_sharded, per-shard write-back) were each unit-tested in
isolation but had never executed *together* in a `jax.process_count() > 1`
program.  This launches two localhost CPU processes (4 virtual devices
each, Gloo collectives) sharing a work dir, runs `gemm_sharded` +
`csrmm_sharded` end-to-end in SPMD, and asserts the shared output files
are byte-identical to a single-process run of the same program.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_local: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_local}")
    env["XLA_FLAGS"] = " ".join(flags)
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    if REPO not in pp:
        pp.insert(0, REPO)
    env["PYTHONPATH"] = os.pathsep.join(pp)
    return env


def test_two_process_data_plane(ctx, rng, tmp_path):
    workdir = str(tmp_path / "mp")
    os.makedirs(workdir)

    # ---- operands, written by the parent before the workers start ----
    m, k, n = 90, 100, 70
    a_np = rng.standard_normal((m, k)).astype(np.float32)
    b_np = rng.standard_normal((k, n)).astype(np.float32)
    import bof_tpu as bt
    A = bt.map_array(os.path.join(workdir, "A.bin"), (m, k), np.float32,
                     "R", create=True, ctx=ctx)
    B = bt.map_array(os.path.join(workdir, "B.bin"), (k, n), np.float32,
                     "R", create=True, ctx=ctx)
    A.write_all(a_np)
    B.write_all(b_np)
    for name, shape in (("C_mp.bin", (m, n)), ("C_sp.bin", (m, n))):
        arr = bt.map_array(os.path.join(workdir, name), shape, np.float32,
                           "R", create=True, ctx=ctx)
        arr.write_all(np.zeros(shape, np.float32))

    import scipy.sparse as sps
    sm, sk, sn = 200, 64, 24
    a_sp = sps.random(sm, sk, density=0.08, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(3))
    sb_np = rng.standard_normal((sk, sn)).astype(np.float32)
    for name, data, dt in (("S.off", a_sp.indptr.astype(np.int64), np.int64),
                           ("S.col", a_sp.indices.astype(np.int64), np.int64),
                           ("S.csr", a_sp.data, np.float32)):
        arr = bt.map_array(os.path.join(workdir, name), data.shape, dt,
                           create=True, ctx=ctx)
        arr.write_all(data)
    SB = bt.map_array(os.path.join(workdir, "SB.bin"), (sk, sn), np.float32,
                      "R", create=True, ctx=ctx)
    SB.write_all(sb_np)
    for name in ("SC_mp.bin", "SC_sp.bin"):
        arr = bt.map_array(os.path.join(workdir, name), (sm, sn), np.float32,
                           "R", create=True, ctx=ctx)
        arr.write_all(np.zeros((sm, sn), np.float32))

    dm, dk, dn = 35, 33, 40
    a64 = rng.standard_normal((dm, dk)) * 10.0 ** rng.uniform(
        -12, 12, (dm, 1))
    b64 = rng.standard_normal((dk, dn))
    for name, data, shape in (("A64.bin", a64, (dm, dk)),
                              ("B64.bin", b64, (dk, dn)),
                              ("C64_mp.bin", None, (dm, dn))):
        arr = bt.map_array(os.path.join(workdir, name), shape, np.float64,
                           "R", create=True, ctx=ctx)
        arr.write_all(data if data is not None
                      else np.zeros(shape, np.float64))

    kn, kd, kk = 165, 8, 4
    kp_np = rng.standard_normal((kn, kd)).astype(np.float32)
    KP = bt.map_array(os.path.join(workdir, "KP.bin"), (kn, kd),
                      np.float32, "R", create=True, ctx=ctx)
    KP.write_all(kp_np)
    for name in ("KL_mp.bin", "KL_sp.bin"):
        arr = bt.map_array(os.path.join(workdir, name), (kn,), np.int32,
                           create=True, ctx=ctx)
        arr.write_all(np.full(kn, -1, np.int32))

    # ---- single-process comparator in THIS process (8 CPU devices) ----
    from bof_tpu.parallel import csrmm_sharded, gemm_sharded, make_mesh
    from bof_tpu.sparse import CsrFlashMatrix
    mesh = make_mesh(8)
    C_sp = bt.map_array(os.path.join(workdir, "C_sp.bin"), (m, n),
                        np.float32, "R", ctx=ctx)
    gemm_sharded(A, B, C_sp, blk=32, mesh=mesh, ctx=ctx)
    ia = bt.map_array(os.path.join(workdir, "S.off"), (sm + 1,), np.int64,
                      ctx=ctx)
    ja = bt.map_array(os.path.join(workdir, "S.col"),
                      (int(a_sp.nnz),), np.int64, ctx=ctx)
    vals = bt.map_array(os.path.join(workdir, "S.csr"),
                        (int(a_sp.nnz),), np.float32, ctx=ctx)
    As = CsrFlashMatrix(ia, ja, vals, (sm, sk))
    SC_sp = bt.map_array(os.path.join(workdir, "SC_sp.bin"), (sm, sn),
                         np.float32, "R", ctx=ctx)
    csrmm_sharded(As, SB, SC_sp, mesh=mesh, ctx=ctx)
    from bof_tpu.parallel import lloyds_iter_ooc_sharded
    KL_sp = bt.map_array(os.path.join(workdir, "KL_sp.bin"), (kn,),
                         np.int32, ctx=ctx)
    kc0 = KP.read_block(0, kk, 0, kd).copy()
    kc_sp, _, _ = lloyds_iter_ooc_sharded(KP, kc0, labels_out=KL_sp,
                                          mesh=mesh, blk_rows=64, ctx=ctx)

    # ---- the two real jax.distributed processes ----
    port = _free_port()
    env = _worker_env(4)
    worker = os.path.join(REPO, "tests", "mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", f"localhost:{port}", workdir],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}:\n{out}"
        assert "MP_OK" in out, f"worker {i}:\n{out}"

    # ---- union of per-process shard writes == single-process output ----
    # dense: the K-reduction rides psum_scatter, whose 2-process (Gloo)
    # reduction order differs from the in-process XLA collective at the
    # last fp32 bit — compare at rounding tolerance, plus the fp64 golden
    got_c = np.fromfile(os.path.join(workdir, "C_mp.bin"), np.float32)
    want_c = np.fromfile(os.path.join(workdir, "C_sp.bin"), np.float32)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5, atol=1e-5)
    want_gold = (a_np.astype(np.float64) @ b_np.astype(np.float64))
    np.testing.assert_allclose(got_c.reshape(m, n),
                               want_gold.astype(np.float32),
                               rtol=2e-4, atol=1e-3)

    # sparse: row-parallel with NO collective — every row is computed by
    # exactly one device either way, so the union of the two processes'
    # shard writes must be byte-identical to the single-process file
    got_s = np.fromfile(os.path.join(workdir, "SC_mp.bin"), np.float32)
    want_s = np.fromfile(os.path.join(workdir, "SC_sp.bin"), np.float32)
    np.testing.assert_array_equal(got_s, want_s)
    np.testing.assert_allclose(got_s.reshape(sm, sn), a_sp @ sb_np,
                               rtol=2e-4, atol=1e-4)

    # kmeans: labels are computed per device (no collective) — the union
    # of the two processes' per-shard label writes must be byte-identical
    # to the single-process file; centers at psum-order tolerance
    got_l = np.fromfile(os.path.join(workdir, "KL_mp.bin"), np.int32)
    want_l = np.fromfile(os.path.join(workdir, "KL_sp.bin"), np.int32)
    assert (want_l >= 0).all()  # comparator actually wrote every row
    np.testing.assert_array_equal(got_l, want_l)
    kc_mp = np.load(os.path.join(workdir, "KC_mp.npy"))
    np.testing.assert_allclose(kc_mp, kc_sp, rtol=1e-5, atol=1e-5)

    # sliced fp64 gemm: each process folded only its plane shards and
    # wrote only those regions — the union must reproduce the fp64
    # product to the slicing-model tolerance (exact int32 collectives,
    # so the 2-process Gloo run loses nothing vs single-process)
    got_64 = np.fromfile(os.path.join(workdir, "C64_mp.bin"),
                         np.float64).reshape(dm, dn)
    want_64 = a64 @ b64
    scl = np.abs(a64).max(1)[:, None] * np.abs(b64).max(0)[None, :]
    err = np.abs(got_64 - want_64) / np.maximum(scl * dk, 1e-300)
    assert err.max() < 1e-12, err.max()

    # one-pass AtA: per-process row folds + fp64 all-gather sum must
    # match the scipy golden (fp32 ELL products bound the tolerance)
    u_mp = np.load(os.path.join(workdir, "U_mp.npy"))
    v_op = np.random.default_rng(17).standard_normal((sk, 5)) \
        .astype(np.float32)
    want_u = a_sp.T.astype(np.float64) @ (a_sp.astype(np.float64) @ v_op)
    np.testing.assert_allclose(u_mp, want_u, rtol=2e-4, atol=1e-4)

    # flagship app x multihost (VERDICT r3 #7): the 2-process block
    # Lanczos SVD (sharded one-pass AtA operator per application) must
    # reproduce the single-process run's singular values and the exact
    # dense SVD golden; the collectives' fp32 rounding-order difference
    # bounds the cross-run tolerance
    from bof_tpu.apps.eigensolver import block_lanczos_svd
    sigma_sp, V_sp = block_lanczos_svd(As, n_vals=3, max_kdim=24,
                                       n_restarts=4, seed=11,
                                       one_pass=True, mesh=mesh, ctx=ctx)
    sigma_mp = np.load(os.path.join(workdir, "SVD_sigma_mp.npy"))
    V_mp = np.load(os.path.join(workdir, "SVD_V_mp.npy"))
    np.testing.assert_allclose(sigma_mp, sigma_sp, rtol=1e-4, atol=1e-4)
    want_sigma = np.linalg.svd(a_sp.toarray(), compute_uv=False)[:3]
    np.testing.assert_allclose(sigma_mp, want_sigma, rtol=1e-3)
    # right singular vectors match up to per-column sign
    dots = np.abs(np.sum(V_mp * V_sp, axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
