#!/usr/bin/env python
"""Concurrency soak: randomized kernels hammering ONE shared context from
many threads until a deadline, every result checked against a float64
golden model.  Catches rare scheduler/cache/pipeline races that the
deterministic suite can't (the reference's analog is running its drivers
in parallel against the same Program Cache).

    python tools/soak.py [--seconds 60] [--threads 4] [--budget-mb 64]

Exit 0 = every operation verified; any mismatch/exception prints the
failing seed and exits 1.  Not part of the default pytest suite (wall
time scales with --seconds); run before releases or after concurrency
work.

Runs on the CPU backend: the races under test live in the host-side
scheduler/cache/pipeline, and the randomized shapes would mint a ~30s
remote compile each on the dev tunnel (plus a second tunnel client
stalls any concurrent chip run).  If the interpreter started with a
non-CPU JAX platform pinned (the axon sitecustomize), main() re-execs
once with the scrubbed environment tests/conftest.py uses; pass
--device to keep the default backend instead.
"""
from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def op_gemm(ctx, rng):
    from bof_tpu import mem_array
    from bof_tpu.ops import gemm
    m, n, k = (int(rng.integers(16, 160)) for _ in range(3))
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    A = mem_array((m, k), np.float32, data=a, ctx=ctx)
    B = mem_array((k, n), np.float32, data=b, ctx=ctx)
    C = mem_array((m, n), np.float32, ctx=ctx)
    gemm(A, B, C, blk=int(rng.choice([32, 64])), ctx=ctx)
    want = a.astype(np.float64) @ b.astype(np.float64)
    got = C.read_all().astype(np.float64)
    assert np.abs(got - want).max() / max(np.abs(want).max(), 1) < 5e-4


def op_csrmm(ctx, rng):
    import scipy.sparse as sps

    from bof_tpu import mem_array
    from bof_tpu.sparse import CsrFlashMatrix, csrmm
    m = int(rng.integers(32, 300))
    k = int(rng.integers(16, 200))
    n = int(rng.integers(2, 48))
    a_sp = sps.random(m, k, density=0.08, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(
                          int(rng.integers(1 << 30))))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    b = rng.standard_normal((k, n)).astype(np.float32)
    B = mem_array((k, n), np.float32, data=b, ctx=ctx)
    C = mem_array((m, n), np.float32, ctx=ctx)
    csrmm(A, B, C, ctx=ctx)
    want = (a_sp @ b).astype(np.float64)
    got = C.read_all().astype(np.float64)
    assert np.abs(got - want).max() / max(np.abs(want).max(), 1) < 5e-4


def op_sort(ctx, rng):
    from bof_tpu import mem_array
    from bof_tpu.ops.sort import bof_sort
    n = int(rng.integers(1 << 10, 1 << 15))
    x = rng.standard_normal(n).astype(np.float32)
    src = mem_array((n,), np.float32, data=x, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    bof_sort(src, dst, blk_elems=int(rng.choice([512, 2048])), ctx=ctx)
    assert np.array_equal(dst.read_all(), np.sort(x))


def op_map_reduce(ctx, rng):
    import jax.numpy as jnp

    from bof_tpu import mem_array
    from bof_tpu.ops.map_reduce import bof_map, bof_reduce
    n = int(rng.integers(1 << 10, 1 << 14))
    x = np.abs(rng.standard_normal(n)).astype(np.float32)
    src = mem_array((n,), np.float32, data=x, ctx=ctx)
    dst = mem_array((n,), np.float32, ctx=ctx)
    bof_map(src, dst, jnp.sqrt, blk_elems=2048, ctx=ctx)
    s = bof_reduce(dst, "sum", blk_elems=2048, ctx=ctx)
    assert abs(s - np.sqrt(x.astype(np.float64)).sum()) < 1e-2 * max(s, 1)


def op_csrgemv(ctx, rng):
    import scipy.sparse as sps

    from bof_tpu.sparse import CsrFlashMatrix, csrgemv
    m = int(rng.integers(32, 300))
    k = int(rng.integers(16, 150))
    a_sp = sps.random(m, k, density=0.06, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(
                          int(rng.integers(1 << 30))))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    trans = "T" if rng.integers(2) else "N"
    x = rng.standard_normal(m if trans == "T" else k).astype(np.float32)
    got = csrgemv(A, x, trans=trans, ctx=ctx)
    want = (a_sp.T @ x) if trans == "T" else (a_sp @ x)
    assert np.allclose(got, want, rtol=1e-3, atol=1e-3)


def op_csrcsc(ctx, rng):
    import scipy.sparse as sps

    from bof_tpu.sparse import CsrFlashMatrix, csrcsc_scratch
    from bof_tpu.core.flash_array import flash_free
    m = int(rng.integers(32, 250))
    k = int(rng.integers(16, 150))
    a_sp = sps.random(m, k, density=0.06, format="csr", dtype=np.float32,
                      random_state=np.random.RandomState(
                          int(rng.integers(1 << 30))))
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    at = csrcsc_scratch(A, ctx=ctx)
    try:
        want = a_sp.T.tocsr()
        want.sort_indices()
        assert np.array_equal(at.read_ia(), want.indptr)
        assert np.array_equal(at.ja.read_all(), want.indices)
        assert np.allclose(at.vals.read_all(), want.data)
    finally:
        for arr in (at.ia, at.ja, at.vals):
            flash_free(arr)


def op_xml_rank(ctx, rng):
    import scipy.sparse as sps

    from bof_tpu.apps import xml_rank
    from bof_tpu.core.flash_array import flash_free, mem_array
    docs = int(rng.integers(16, 150))
    vocab = int(rng.integers(8, 80))
    L = int(rng.integers(3, 40))
    k = int(rng.integers(1, min(L, 8) + 1))
    from bof_tpu.sparse import CsrFlashMatrix
    a_sp = sps.random(docs, vocab, density=0.1, format="csr",
                      dtype=np.float32,
                      random_state=np.random.RandomState(
                          int(rng.integers(1 << 30))))
    w = rng.standard_normal((L, vocab)).astype(np.float32)
    A = CsrFlashMatrix.from_scipy(a_sp, ctx=ctx)
    W = mem_array((L, vocab), np.float32, data=w, ctx=ctx)
    s, l = xml_rank(A, W, k, fused=bool(rng.integers(2)), ctx=ctx)
    try:
        want = (a_sp @ w.T).astype(np.float32)
        ws = -np.sort(-want, axis=1)[:, :k]
        assert np.allclose(s.read_all(), ws, rtol=2e-4, atol=1e-4)
    finally:
        flash_free(s)
        flash_free(l)


def op_flash_io(ctx, rng):
    from bof_tpu.core.flash_array import flash_empty, flash_free
    rows, cols = int(rng.integers(8, 128)), int(rng.integers(8, 128))
    arr = flash_empty((rows, cols), np.float32, ctx=ctx)
    try:
        data = rng.standard_normal((rows, cols)).astype(np.float32)
        arr.write_all(data)
        r0 = int(rng.integers(0, rows))
        nr = int(rng.integers(1, rows - r0 + 1))
        assert np.array_equal(arr.read_block(r0, nr, 0, cols), data[r0:r0 + nr])
    finally:
        flash_free(arr)


def op_gemm64(ctx, rng):
    """Sliced fp64 gemm (ops/gemm64.py) under concurrency: the HBM slice
    LRU, pin cache, and int32-plane flushes all share the context."""
    from bof_tpu import mem_array
    from bof_tpu.ops import gemm
    ctx.config.fp64_device = "sliced"
    m, n, k = (int(rng.integers(16, 120)) for _ in range(3))
    a = rng.standard_normal((m, k)) * 10.0 ** rng.uniform(-6, 6, (m, 1))
    b = rng.standard_normal((k, n))
    A = mem_array((m, k), np.float64, data=a, ctx=ctx)
    B = mem_array((k, n), np.float64, data=b, ctx=ctx)
    C = mem_array((m, n), np.float64, ctx=ctx)
    gemm(A, B, C, blk=int(rng.choice([32, 64])), ctx=ctx)
    want = a @ b
    scale = (np.abs(a).max(axis=1)[:, None]
             * np.abs(b).max(axis=0)[None, :]) * k
    err = (np.abs(C.read_all() - want) / np.maximum(scale, 1e-300)).max()
    assert err < 1e-12, f"gemm64 scaled err {err:.2e}"


def op_rewrite_gemm(ctx, rng):
    """Write-path cache coherence under concurrency: gemm caches operand
    tiles, a direct write_block rewrites part of A, the second gemm must
    see the fresh data (invalidate_overlap racing other threads' pins)."""
    from bof_tpu import mem_array
    from bof_tpu.ops import gemm
    m, n, k = (int(rng.integers(32, 140)) for _ in range(3))
    a = rng.standard_normal((m, k)).astype(np.float32)
    b = rng.standard_normal((k, n)).astype(np.float32)
    A = mem_array((m, k), np.float32, data=a, ctx=ctx)
    B = mem_array((k, n), np.float32, data=b, ctx=ctx)
    C = mem_array((m, n), np.float32, ctx=ctx)
    blk = int(rng.choice([32, 64]))
    gemm(A, B, C, blk=blk, ctx=ctx)
    r0 = int(rng.integers(0, m))
    nr = int(rng.integers(1, m - r0 + 1))
    patch = rng.standard_normal((nr, k)).astype(np.float32)
    A.write_block(r0, patch)
    a[r0:r0 + nr] = patch
    gemm(A, B, C, blk=blk, ctx=ctx)
    want = a.astype(np.float64) @ b.astype(np.float64)
    got = C.read_all().astype(np.float64)
    assert np.abs(got - want).max() / max(np.abs(want).max(), 1) < 5e-4, \
        "stale tile served after direct rewrite"


OPS = [op_gemm, op_csrmm, op_sort, op_map_reduce, op_flash_io,
       op_csrgemv, op_csrcsc, op_xml_rank, op_gemm64, op_rewrite_gemm]


def _reexec_on_cpu() -> None:
    """Re-run this script once with the scrubbed CPU environment (the
    tests/conftest.py pattern): the axon sitecustomize imports jax and
    pins JAX_PLATFORMS at interpreter start, before any code here runs."""
    import subprocess
    env = dict(os.environ)
    env["BOF_SOAK_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pp)
    os._exit(subprocess.run([sys.executable] + sys.argv, env=env).returncode)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--budget-mb", type=int, default=64,
                   help="small budget keeps eviction/backlog paths hot")
    p.add_argument("--scratch", default="/tmp/bof_soak")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--device", action="store_true",
                   help="soak the default JAX backend instead of CPU")
    args = p.parse_args()

    if (not args.device and os.environ.get("BOF_SOAK_REEXEC") != "1"
            and os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")):
        _reexec_on_cpu()

    from bof_tpu import FlashConfig, FlashContext
    ctx = FlashContext(FlashConfig(
        scratch_dir=args.scratch, program_budget=args.budget_mb << 20,
        n_io_threads=4, n_compute_threads=2, max_nnzs=2048))
    deadline = time.monotonic() + args.seconds
    base_seed = (args.seed if args.seed is not None
                 else int.from_bytes(os.urandom(4), "little"))
    print(f"soak: {args.threads} threads, {args.seconds:.0f}s, "
          f"budget {args.budget_mb} MB, base seed {base_seed}", flush=True)
    counts = [0] * args.threads
    failures: list = []

    def worker(tid):
        i = 0
        while time.monotonic() < deadline and not failures:
            seed = base_seed + tid * 1_000_003 + i
            rng = np.random.default_rng(seed)
            op = OPS[int(rng.integers(len(OPS)))]
            try:
                op(ctx, rng)
            except BaseException as e:
                failures.append((tid, seed, op.__name__, e))
                return
            counts[tid] += 1
            i += 1

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ctx.destroy()
    if failures:
        tid, seed, name, e = failures[0]
        print(f"FAIL thread {tid} seed {seed} op {name}: "
              f"{type(e).__name__}: {e}")
        return 1
    print(f"soak OK: {sum(counts)} verified ops "
          f"({', '.join(str(c) for c in counts)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
