#!/usr/bin/env python
"""Headline benchmark: out-of-core SGEMM GFLOP/s vs in-memory device matmul.

Prints ONE JSON line:
  {"metric": "ooc_sgemm_gflops", "value": N, "unit": "GFLOP/s",
   "vs_baseline": ooc/in-mem ratio, ...details}

The problem size adapts to the measured host->device bandwidth so the run
fits a wall-clock budget (the dev tunnel moves ~0.05 GB/s; a real TPU host
moves tens of GB/s and gets a proportionally larger problem).  Operand
files are cached across rounds under ~/.cache/bof_tpu/bench.

Env overrides: BOF_BENCH_N, BOF_BENCH_BLK, BOF_BENCH_BUDGET_S,
BOF_BENCH_PREC (highest|default), BOF_BENCH_SKIP_VERIFY=1.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def measure_inmem_tflops(sb: int, prec, iters: int = 4) -> float:
    """Device-resident matmul rate (the in-memory MKL twin's role,
    reference: drivers/in_mem_gemm.cpp)."""
    import jax
    import jax.numpy as jnp

    a = jax.random.normal(jax.random.PRNGKey(0), (sb, sb), jnp.float32)
    f = jax.jit(lambda x, y: jnp.dot(x, y, precision=prec,
                                     preferred_element_type=jnp.float32))

    def sync(x):
        return float(np.asarray(jnp.sum(x[:1, :1])))

    sync(f(a, a))
    t0 = time.perf_counter()
    x = a
    for _ in range(iters):
        x = f(x, a)
    sync(x)
    dt = (time.perf_counter() - t0) / iters
    return 2 * sb**3 / dt / 1e12


def measure_h2d_gbps() -> float:
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda d: jnp.sum(d[:1]))
    x = np.empty(64 << 20, np.uint8)
    float(np.asarray(g(jax.device_put(x[:1 << 20]))))  # warm
    t0 = time.perf_counter()
    d = jax.device_put(x)
    float(np.asarray(g(d)))
    return x.nbytes / (time.perf_counter() - t0) / 1e9


def ensure_operand(path: str, n: int, seed: int):
    nbytes = n * n * 4
    if os.path.exists(path) and os.path.getsize(path) == nbytes:
        return
    rng = np.random.default_rng(seed)
    with open(path, "wb") as f:
        chunk = 1 << 22  # elements
        left = n * n
        while left:
            c = min(chunk, left)
            f.write(rng.standard_normal(c).astype(np.float32).tobytes())
            left -= c


def main():
    import bof_tpu as bt
    from bof_tpu.ops import gemm

    budget_s = float(os.environ.get("BOF_BENCH_BUDGET_S", "240"))
    prec_name = os.environ.get("BOF_BENCH_PREC", "highest")
    sb = int(os.environ.get("BOF_BENCH_BLK", "4096"))

    import jax
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[prec_name]

    inmem_tflops = measure_inmem_tflops(min(sb, 8192), prec)
    h2d_gbps = measure_h2d_gbps()

    n_env = os.environ.get("BOF_BENCH_N")
    if n_env:
        n = int(n_env)
    else:
        # transfers ~ (A + B cross once) + C down: 3*N^2*4 bytes at h2d;
        # compute 2N^3; pick N so the slower of the two ~ 0.6*budget
        cache_root = os.path.expanduser("~/.cache")
        os.makedirs(cache_root, exist_ok=True)
        sv = os.statvfs(cache_root)  # operands live under ~/.cache
        free = sv.f_frsize * sv.f_bavail
        best = sb
        n = sb
        while True:
            cand = n + sb
            # probe bandwidth is optimistic vs sustained; derate by 2x
            t_xfer = 3 * cand * cand * 4 / (0.5 * h2d_gbps * 1e9)
            t_comp = 2 * cand**3 / (inmem_tflops * 1e12)
            if max(t_xfer, t_comp) > 0.6 * budget_s:
                break
            if 3 * cand * cand * 4 > 0.5 * free:
                break
            n = cand
        n = max(n, 2 * sb)

    cache_dir = os.path.join(os.path.expanduser("~/.cache/bof_tpu/bench"))
    os.makedirs(cache_dir, exist_ok=True)
    a_path = os.path.join(cache_dir, f"A_{n}.bin")
    b_path = os.path.join(cache_dir, f"B_{n}.bin")
    c_path = os.path.join(cache_dir, f"C_{n}.bin")
    ensure_operand(a_path, n, 1)
    ensure_operand(b_path, n, 2)

    cfg = bt.FlashConfig(
        scratch_dir=os.path.join(cache_dir, "scratch"),
        program_budget=min(48 << 30, 3 * n * n * 4 + (1 << 30)),
        n_io_threads=8, gemm_blk_size=sb,
        pipeline_depth=int(os.environ.get("BOF_BENCH_DEPTH", "3")),
        tile_cache_backend=os.environ.get("BOF_BENCH_CACHE", "auto"))
    cfg.matmul_precision = prec_name
    ctx = bt.FlashContext(cfg)
    A = bt.map_array(a_path, (n, n), np.float32, "R", ctx=ctx)
    B = bt.map_array(b_path, (n, n), np.float32, "R", ctx=ctx)
    C = bt.map_array(c_path, (n, n), np.float32, "R", create=True, ctx=ctx)

    # warm-up: compile the accumulate steps on a 2-superblock problem
    # (clamped: BOF_BENCH_N may be smaller than 2 superblocks)
    warm = min(2 * sb, n)
    Aw = bt.FlashArray(A.store, (warm, warm), np.float32, "R", ld=n, ctx=ctx)
    Bw = bt.FlashArray(B.store, (warm, warm), np.float32, "R", ld=n, ctx=ctx)
    Cw = bt.FlashArray(C.store, (warm, warm), np.float32, "R", ld=n, ctx=ctx)
    gemm(Aw, Bw, Cw, blk=sb, ctx=ctx)

    t0 = time.perf_counter()
    gemm(A, B, C, blk=sb, ctx=ctx)
    dt = time.perf_counter() - t0
    flops = 2.0 * n**3
    ooc_gflops = flops / dt / 1e9

    # honest in-memory twin: the SAME problem size fully device-resident,
    # when it fits HBM; else keep the extrapolated small-matmul rate
    if 3 * n * n * 4 <= 12 << 30:
        try:
            inmem_tflops = measure_inmem_tflops(n, prec, iters=1)
        except Exception:
            pass

    # sanity: verify one output block against a host golden sample
    ok = True
    if os.environ.get("BOF_BENCH_SKIP_VERIFY") != "1":
        s = 64
        a_rows = A.read_block(0, s, 0, n).astype(np.float64)
        b_cols = B.read_block(0, n, 0, s).astype(np.float64)
        want = a_rows @ b_cols
        got = C.read_block(0, s, 0, s).astype(np.float64)
        rel = float(np.abs(got - want).max() / (np.abs(want).max() or 1.0))
        ok = rel < 1e-3
    ctx.destroy()

    in_mem_time = flops / (inmem_tflops * 1e12)
    result = {
        "metric": "ooc_sgemm_gflops",
        "value": round(ooc_gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(dt and (in_mem_time / dt), 4),
        "n": n, "blk": sb, "seconds": round(dt, 2),
        "in_mem_tflops": round(inmem_tflops, 2),
        "h2d_gbps": round(h2d_gbps, 4),
        "achieved_h2d_gbps": round(3 * n * n * 4 / dt / 1e9, 4),
        "precision": prec_name,
        "verified": ok,
    }
    try:  # observability: native engine + pin cache activity
        import ctypes
        from bof_tpu.io.native import load_library
        lib = load_library()
        if lib is not None:
            lib.bof_aio_ops.restype = ctypes.c_longlong
            result["kernel_aio_runs"] = int(lib.bof_aio_ops())
    except Exception:
        pass
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
