#!/usr/bin/env python
"""Host phase-body fan-out microbench: parallel_sort and the native
counting argsort vs their numpy baselines (the reference's
__gnu_parallel::sort / OpenMP role, sort_task.h:8, csrcsc_task.h:101).

On a 1-core box parallel_sort degrades to np.sort (parity) and the
counting argsort still wins 15-22x (O(n+k) vs comparison sort); on a
multi-core host the sharded paths engage (BOF_HOST_THREADS overrides).

    python tools/hostpar_bench.py [--n 8000000] [--k 16384]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8_000_000)
    p.add_argument("--k", type=int, default=16384)
    args = p.parse_args()

    from bof_tpu.io.native import counting_argsort_i32
    from bof_tpu.utils.hostpar import fanout_threads, parallel_sort
    rng = np.random.default_rng(0)
    nt = fanout_threads(args.n)
    print(f"cores={os.cpu_count()} fanout_threads={nt} "
          f"(BOF_HOST_THREADS={os.environ.get('BOF_HOST_THREADS', '-')})",
          file=sys.stderr)

    x = rng.standard_normal(args.n).astype(np.float32)
    y = x.copy()
    t_np = timeit(lambda: y.sort())
    t_ps = timeit(parallel_sort, x)
    assert np.array_equal(x, y)
    print(f"sort {args.n} f32: np.sort {t_np * 1e3:.0f} ms  "
          f"parallel_sort {t_ps * 1e3:.0f} ms  ({t_np / t_ps:.2f}x)")

    keys = rng.integers(0, args.k, args.n).astype(np.int32)
    t_np = timeit(lambda: np.argsort(keys, kind="stable"))
    t0 = time.perf_counter()
    got = counting_argsort_i32(keys, args.k)
    t_na = time.perf_counter() - t0
    assert got is not None
    assert np.array_equal(got, np.argsort(keys, kind="stable"))
    print(f"stable argsort {args.n} keys (k={args.k}): np.argsort "
          f"{t_np * 1e3:.0f} ms  native {t_na * 1e3:.0f} ms  "
          f"({t_np / t_na:.2f}x)")


if __name__ == "__main__":
    main()
