#!/usr/bin/env python
"""Sliced-fp64 device-step microbench: effective fp64 FLOP/s of the
Ozaki int8 path (ops/gemm64._slice_accum) on the current backend.

Times the steady-state superblock step with DEVICE-RESIDENT slice stacks
(no link traffic — the pure MXU term of the roofline), and the
fp32-HIGHEST accum_step for context (the other high-accuracy path).
Effective fp64 rate = 2*m*n*k / t per step; theory on v5e is
~394 int8 TOPS / 36 products' worth of MACs ~ 11 TF/s at s=8 (the MACs
run as s anti-diagonal dot_generals, not 36 separate products).

    python tools/fp64_bench.py [--sb 4096] [--slices 8] [--iters 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sb", type=int, default=4096)
    p.add_argument("--slices", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    sb, s = args.sb, args.slices

    import jax
    import jax.numpy as jnp

    from bof_tpu.ops import device as dev
    from bof_tpu.ops.gemm64 import _slice_accum

    print(f"backend: {jax.default_backend()}  sb={sb}  s={s} "
          f"({s * (s + 1) // 2} int8 products' MACs in {s} diagonal "
          f"dots/step)", file=sys.stderr)
    rng = np.random.default_rng(1)
    a_sl = dev.to_device(rng.integers(-64, 65, (s, sb, sb), dtype=np.int8))
    b_sl = dev.to_device(rng.integers(-64, 65, (s, sb, sb), dtype=np.int8))
    S = jnp.zeros((s, sb, sb), jnp.int32)
    # warm (compile)
    S = _slice_accum(S, a_sl, b_sl, a_km=False, b_nk=False, c_nm=False)
    dev.sync(S)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        S = _slice_accum(S, a_sl, b_sl, a_km=False, b_nk=False, c_nm=False)
    dev.sync(S)
    dt = (time.perf_counter() - t0) / args.iters
    eff = 2.0 * sb ** 3 / dt
    print(f"sliced fp64 step: {dt * 1e3:.1f} ms  ->  "
          f"{eff / 1e12:.2f} effective fp64 TFLOP/s")

    # context: fp32-HIGHEST (the 6-pass bf16 parity path)
    a32 = dev.to_device(rng.standard_normal((sb, sb)).astype(np.float32))
    b32 = dev.to_device(rng.standard_normal((sb, sb)).astype(np.float32))
    c32 = jnp.zeros((sb, sb), jnp.float32)
    c32 = dev.accum_step(c32, a32, b32, np.float32(1.0), a_km=False,
                         b_nk=False, c_nm=False, prec="highest")
    dev.sync(c32)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        c32 = dev.accum_step(c32, a32, b32, np.float32(1.0), a_km=False,
                             b_nk=False, c_nm=False, prec="highest")
    dev.sync(c32)
    dt32 = (time.perf_counter() - t0) / args.iters
    print(f"fp32-HIGHEST step: {dt32 * 1e3:.1f} ms  ->  "
          f"{2.0 * sb ** 3 / dt32 / 1e12:.2f} TFLOP/s "
          f"(sliced-fp64/fp32-highest ratio {dt32 / dt:.2f})")


if __name__ == "__main__":
    main()
