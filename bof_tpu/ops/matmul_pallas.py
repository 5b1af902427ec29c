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


def _make_kernel(precision):
    def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], precision=precision,
                              preferred_element_type=jnp.float32)

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
                                    "out_dtype"))
def matmul(a, b, *, bm: int = 512, bn: int = 0, bk: int = 512,
           prec: str = "highest", interpret: bool = False, out_dtype=None):
    """C = A @ B with fp32 accumulation.  A:(M,K) B:(K,N) — shapes must be
    multiples of the tile sizes (the out-of-core planner pads superblocks
    to multiples, so no in-kernel masking is needed).  `out_dtype` defaults
    to a.dtype; accumulate chains pass the ACCUMULATOR's dtype so a bf16
    transfer mode doesn't round each partial to bf16."""
    from .device import _precision
    if bn == 0:
        bn = bn_default(prec)
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, (a.shape, b.shape)
    assert m % bm == 0 and n % bn == 0 and k % bk == 0, (
        f"shapes {(m, n, k)} not multiples of tiles {(bm, bn, bk)}")
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        _make_kernel(_precision(prec)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype or a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, l: (i, l)),
            pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n + m * n) * a.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(a, b)
