#!/usr/bin/env python
"""Paired multi-run medians for the Program-Cache prioritizer A/B.

The single-invocation `BOF_BENCH_KERNEL=cache` mode (bench.run_cache)
established that the prioritizer's min-bytes-to-fetch ranking
(reference: include/scheduler/prioritizer.h:116-139) durably cuts bytes
fetched, but its WALL ratio swings 0.43-1.15x run-to-run on this vdisk
(docs/PERFORMANCE.md, multi-run correction).  Single samples of a noisy
quantity prove nothing either way; this tool runs N PAIRED samples —
prio and FCFS back-to-back per pair, alternating which runs first so
disk-state drift (burst credits, host cache) cancels across the set —
and reports per-pair ratios plus medians.

    python tools/cache_medians.py [--pairs 5] [--n 4096] [--blk 512]
        [--shuffled]  # also sample the order-randomized DAG

Writes docs/artifacts/cache_pressure_medians.json (unless --no-artifact)
and prints one JSON line.  Disk + host DRAM only: tunnel-independent.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=5)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--blk", type=int, default=512)
    p.add_argument("--shuffled", action="store_true",
                   help="shuffle task insertion order (seed=pair index)")
    p.add_argument("--no-artifact", action="store_true")
    args = p.parse_args()

    n = (args.n // args.blk) * args.blk
    ws = 3 * n * n * 4
    budget = ws // 4
    a_path = os.path.join(bench.CACHE_DIR, f"A_{n}.bin")
    b_path = os.path.join(bench.CACHE_DIR, f"B_{n}.bin")
    os.makedirs(bench.CACHE_DIR, exist_ok=True)
    bench.ensure_operand(a_path, n, 1)
    bench.ensure_operand(b_path, n, 2)

    # one unrecorded warm-up (numpy BLAS init, engine load, thread spin-up)
    n_w = max(2 * args.blk, (n // 4 // args.blk) * args.blk)
    a_w = os.path.join(bench.CACHE_DIR, f"A_{n_w}.bin")
    b_w = os.path.join(bench.CACHE_DIR, f"B_{n_w}.bin")
    bench.ensure_operand(a_w, n_w, 1)
    bench.ensure_operand(b_w, n_w, 2)
    bench._dag_gemm_run(a_w, b_w, bench.output_path(f"cacheC_warm_{n_w}"),
                        n_w, args.blk, max(budget, 3 * args.blk**2 * 4 * 2),
                        True)

    pairs = []
    t_start = time.perf_counter()
    for i in range(args.pairs):
        seed = (123 + i) if args.shuffled else None
        order = (("prio", True), ("fcfs", False))
        if i % 2:  # alternate which arm runs first: drift cancels
            order = order[::-1]
        sample = {}
        for tag, use_prio in order:
            sample[tag] = bench._dag_gemm_run(
                a_path, b_path, bench.output_path(f"cacheC_med_{tag}_{n}"),
                n, args.blk, budget, use_prio, seed)
        rec = {
            "pair": i, "first": order[0][0], "seed": seed,
            "prio_wall_s": sample["prio"]["wall_s"],
            "fcfs_wall_s": sample["fcfs"]["wall_s"],
            "prio_fetch_gb": sample["prio"]["fetch_gb"],
            "fcfs_fetch_gb": sample["fcfs"]["fetch_gb"],
            "fetch_ratio": round(sample["fcfs"]["fetch_gb"]
                                 / max(sample["prio"]["fetch_gb"], 1e-9), 4),
            "wall_ratio": round(sample["fcfs"]["wall_s"]
                                / max(sample["prio"]["wall_s"], 1e-9), 4),
            "evictions_min": min(sample["prio"]["evictions"],
                                 sample["fcfs"]["evictions"]),
            "ok": bool(sample["prio"]["ok"] and sample["fcfs"]["ok"]),
        }
        pairs.append(rec)
        print(f"[pair {i}] first={rec['first']} "
              f"fetch_ratio={rec['fetch_ratio']} "
              f"wall_ratio={rec['wall_ratio']} "
              f"(prio {rec['prio_wall_s']}s / fcfs {rec['fcfs_wall_s']}s)",
              file=sys.stderr, flush=True)

    out = {
        "n": n, "blk": args.blk, "budget_mb": round(budget / (1 << 20), 1),
        "ws_over_budget": round(ws / budget, 2),
        "shuffled": args.shuffled, "pairs": pairs,
        "fetch_ratio_median": round(statistics.median(
            r["fetch_ratio"] for r in pairs), 4),
        "fetch_ratio_min": min(r["fetch_ratio"] for r in pairs),
        "fetch_ratio_max": max(r["fetch_ratio"] for r in pairs),
        "wall_ratio_median": round(statistics.median(
            r["wall_ratio"] for r in pairs), 4),
        "wall_ratio_min": min(r["wall_ratio"] for r in pairs),
        "wall_ratio_max": max(r["wall_ratio"] for r in pairs),
        "evictions_min": min(r["evictions_min"] for r in pairs),
        "all_ok": all(r["ok"] for r in pairs),
        "total_s": round(time.perf_counter() - t_start, 1),
    }
    if not args.no_artifact:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        stem = ("cache_pressure_medians_shuffled" if args.shuffled
                else "cache_pressure_medians")
        art = os.path.join(here, "docs", "artifacts", f"{stem}.json")
        with open(art, "w") as f:
            json.dump({"ts": time.time(), "result": out}, f, indent=1)
        out["artifact"] = os.path.relpath(art, here)
    print(json.dumps(out, separators=(",", ":")))
    return 0 if out["all_ok"] and out["evictions_min"] > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
