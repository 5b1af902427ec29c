"""Pallas MXU tiled matmul kernel.

The in-superblock analog of the reference's MKL sgemm call per task
(reference: gemm_task.h:67-93) — but instead of a BLAS library call, an
explicit MXU pipeline: grid over (M/bm, N/bn, K/bk), A/B tiles staged
HBM→VMEM by the Pallas pipeline, fp32 accumulation in a VMEM scratch
across the K steps, result flushed to the output tile on the last K step.

Used inside the out-of-core GEMM's accumulate step when running on TPU
(`FlashConfig.device_compute='pallas'`); `jnp.dot` (XLA) is the fallback
and the CPU/test path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(precision, a_km: bool = False, b_nk: bool = False,
                 c_nm: bool = False):
    """Kernel generalized over storage-major layouts (the 8 reference
    gemm configs, gemm.cpp:44-67): `dot_general` contracting dims absorb
    the transposes in-kernel, so km/nk/nm-stored tiles hit the MXU with
    no XLA fallback and no host/device transposition."""
    def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        ka = 0 if a_km else 1
        kb = 1 if b_nk else 0
        if not c_nm:
            acc_ref[:] += jax.lax.dot_general(
                a_ref[:], b_ref[:], (((ka,), (kb,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
        else:  # output stored (n, m): compute the transposed product
            acc_ref[:] += jax.lax.dot_general(
                b_ref[:], a_ref[:], (((kb,), (ka,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    return _matmul_kernel


def bn_default(prec: str) -> int:
    """Output-tile width: HIGHEST fp32 runs the 6-pass MXU expansion,
    which needs extra VMEM stack — narrower tiles stay under the limit.
    Shared with device.accum_step so both call paths pick the same
    kernel shapes."""
    return 512 if prec == "highest" else 1024


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "prec", "interpret",
                                    "out_dtype", "a_km", "b_nk", "c_nm"))
def matmul(a, b, *, bm: int = 512, bn: int = 0, bk: int = 512,
           prec: str = "highest", interpret: bool = False, out_dtype=None,
           a_km: bool = False, b_nk: bool = False, c_nm: bool = False):
    """C = op(A) @ op(B) with fp32 accumulation, storage-major in and out.

    a: (M,K) or, with a_km, (K,M) storage; b: (K,N) or, with b_nk, (N,K);
    the result is (M,N) or, with c_nm, (N,M) storage.  Logical shapes must
    be multiples of the tile sizes (the out-of-core planner pads
    superblocks to multiples, so no in-kernel masking is needed).
    `out_dtype` defaults to a.dtype; accumulate chains pass the
    ACCUMULATOR's dtype so a bf16 transfer mode doesn't round each
    partial to bf16."""
    from .device import _precision
    if bn == 0:
        bn = bn_default(prec)
    m, k = (a.shape[1], a.shape[0]) if a_km else a.shape
    k2, n = (b.shape[1], b.shape[0]) if b_nk else b.shape
    assert k == k2, (a.shape, b.shape)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (
        f"shapes {(m, n, k)} not multiples of tiles {(bm, bn, bk)}")
    grid = (m // bm, n // bn, k // bk)
    a_spec = (pl.BlockSpec((bk, bm), lambda i, j, l: (l, i)) if a_km
              else pl.BlockSpec((bm, bk), lambda i, j, l: (i, l)))
    b_spec = (pl.BlockSpec((bn, bk), lambda i, j, l: (j, l)) if b_nk
              else pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)))
    o_spec = (pl.BlockSpec((bn, bm), lambda i, j, l: (j, i)) if c_nm
              else pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)))
    o_shape = (n, m) if c_nm else (m, n)
    acc_shape = (bn, bm) if c_nm else (bm, bn)
    return pl.pallas_call(
        _make_kernel(_precision(prec), a_km, b_nk, c_nm),
        out_shape=jax.ShapeDtypeStruct(o_shape, out_dtype or a.dtype),
        grid=grid,
        in_specs=[a_spec, b_spec],
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM(acc_shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n + m * n) * a.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a, b)
