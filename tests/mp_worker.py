"""Worker for the REAL two-process multi-host data-plane test.

Launched by tests/test_multiprocess.py as two `jax.distributed` processes
(4 virtual CPU devices each, Gloo collectives) sharing one work dir.  Each
process runs the SAME SPMD program: `gemm_sharded` + `csrmm_sharded` over
file-backed operands, with `jax.process_count() == 2` engaging — for the
first time together — the per-shard sharded-read producer
(mesh._shard_read_plan), the multihost `device_put_sharded` branch
(mesh.device_put_sharded -> _put_addressable) and the per-shard
write-back (mesh._writeback_shards).  The parent verifies the shared
output files against a single-process run.

Usage: mp_worker.py <process_id> <num_processes> <coordinator> <workdir>
"""
import os
import sys

import numpy as np


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    addr, workdir = sys.argv[3], sys.argv[4]

    import jax
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    from jax.experimental import multihost_utils

    import bof_tpu as bt
    from bof_tpu.parallel import csrmm_sharded, gemm_sharded, make_mesh
    from bof_tpu.sparse import CsrFlashMatrix

    ctx = bt.FlashContext(bt.FlashConfig(
        scratch_dir=os.path.join(workdir, f"scratch_p{pid}"),
        n_io_threads=2, n_compute_threads=1, program_budget=64 << 20,
        pipeline_depth=2))
    mesh = make_mesh(8)

    # ---- dense: gemm_sharded over the shared files ----
    m, k, n = 90, 100, 70  # ragged vs blk=32 on every axis
    A = bt.map_array(os.path.join(workdir, "A.bin"), (m, k), np.float32,
                     "R", ctx=ctx)
    B = bt.map_array(os.path.join(workdir, "B.bin"), (k, n), np.float32,
                     "R", ctx=ctx)
    C = bt.map_array(os.path.join(workdir, "C_mp.bin"), (m, n), np.float32,
                     "R", ctx=ctx)
    gemm_sharded(A, B, C, blk=32, mesh=mesh, ctx=ctx)
    C.store.flush()
    print(f"[p{pid}] gemm_sharded done", flush=True)
    multihost_utils.sync_global_devices("gemm done")

    # ---- sparse: csrmm_sharded over the shared CSR triplet ----
    sm, sk, sn = 200, 64, 24
    ia = bt.map_array(os.path.join(workdir, "S.off"), (sm + 1,), np.int64,
                      ctx=ctx)
    nnz = int(ia.read_block(sm, 1)[0])
    ja = bt.map_array(os.path.join(workdir, "S.col"), (nnz,), np.int64,
                      ctx=ctx)
    vals = bt.map_array(os.path.join(workdir, "S.csr"), (nnz,), np.float32,
                        ctx=ctx)
    As = CsrFlashMatrix(ia, ja, vals, (sm, sk))
    Bs = bt.map_array(os.path.join(workdir, "SB.bin"), (sk, sn), np.float32,
                      "R", ctx=ctx)
    Cs = bt.map_array(os.path.join(workdir, "SC_mp.bin"), (sm, sn),
                      np.float32, "R", ctx=ctx)
    csrmm_sharded(As, Bs, Cs, mesh=mesh, ctx=ctx)
    Cs.store.flush()
    print(f"[p{pid}] csrmm_sharded done", flush=True)
    multihost_utils.sync_global_devices("csrmm done")

    # ---- DP kmeans: sharded point reads + per-shard label write-back ----
    from bof_tpu.parallel import lloyds_iter_ooc_sharded
    kn, kd, kk = 165, 8, 4  # ragged vs blk_rows and the mesh
    KP = bt.map_array(os.path.join(workdir, "KP.bin"), (kn, kd),
                      np.float32, "R", ctx=ctx)
    KL = bt.map_array(os.path.join(workdir, "KL_mp.bin"), (kn,), np.int32,
                      ctx=ctx)
    c0 = KP.read_block(0, kk, 0, kd).copy()
    new_c, inertia, counts = lloyds_iter_ooc_sharded(
        KP, c0, labels_out=KL, mesh=mesh, blk_rows=64, ctx=ctx)
    if pid == 0:  # statistics are psum-replicated: any process may save
        np.save(os.path.join(workdir, "KC_mp.npy"), new_c)
    print(f"[p{pid}] kmeans dp done (inertia {inertia:.3f})", flush=True)
    multihost_utils.sync_global_devices("kmeans done")

    # ---- sliced fp64 gemm: per-process plane-shard folds + region
    # write-back (ops/gemm64.py multihost path; device sees int8/int32
    # only, so no x64 mode is needed in the workers) ----
    from bof_tpu.ops.gemm64 import gemm64
    dm, dk, dn = 35, 33, 40  # ragged vs the lcm-rounded blk
    A6 = bt.map_array(os.path.join(workdir, "A64.bin"), (dm, dk),
                      np.float64, "R", ctx=ctx)
    B6 = bt.map_array(os.path.join(workdir, "B64.bin"), (dk, dn),
                      np.float64, "R", ctx=ctx)
    C6 = bt.map_array(os.path.join(workdir, "C64_mp.bin"), (dm, dn),
                      np.float64, "R", ctx=ctx)
    gemm64(A6, B6, C6, blk=16, ctx=ctx, mesh=mesh)
    C6.store.flush()
    print(f"[p{pid}] gemm64 multihost done", flush=True)
    multihost_utils.sync_global_devices("gemm64 done")

    # ---- sharded one-pass AtA operator: per-process U-shard folds +
    # final fp64 all-gather sum (apps/eigensolver.py multihost path) ----
    from bof_tpu.apps.eigensolver import _apply_ata_one_pass_sharded
    rng_op = np.random.default_rng(17)
    v_op = rng_op.standard_normal((sk, 5)).astype(np.float32)
    u_op = _apply_ata_one_pass_sharded(As, v_op, mesh, ctx)
    if pid == 0:  # finalize() all-gathers: every process holds full U
        np.save(os.path.join(workdir, "U_mp.npy"), u_op)
    print(f"[p{pid}] one-pass AtA multihost done", flush=True)
    multihost_utils.sync_global_devices("one-pass done")

    # ---- flagship app x multihost data plane: block Lanczos SVD with
    # every operator application running the sharded one-pass AtA
    # (VERDICT r3 #7 — the last composition that had never executed
    # under jax.process_count() > 1).  The Krylov host algebra stays in
    # lockstep across processes because U is all-gather-replicated.
    from bof_tpu.apps.eigensolver import block_lanczos_svd
    sigma, V = block_lanczos_svd(As, n_vals=3, max_kdim=24,
                                 n_restarts=4, seed=11,
                                 one_pass=True, mesh=mesh, ctx=ctx)
    if pid == 0:
        np.save(os.path.join(workdir, "SVD_sigma_mp.npy"), sigma)
        np.save(os.path.join(workdir, "SVD_V_mp.npy"), V)
    print(f"[p{pid}] block_lanczos_svd multihost done "
          f"(sigma {np.array2string(sigma, precision=4)})", flush=True)
    multihost_utils.sync_global_devices("lanczos done")

    ctx.destroy()
    print(f"[p{pid}] MP_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
