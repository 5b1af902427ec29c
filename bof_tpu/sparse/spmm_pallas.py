"""Pallas ELL SpMM kernel: explicit VMEM gather for the sparse hot loop.

The in-block analog of the reference's MKL csrmm call per task (reference:
SimpleCsrmmRmTask::execute, csrmm_task.h:201-229) as an explicit TPU
kernel, alternative to the XLA take+reduce path in spmm_device.py:

  - the dense B column panel is held resident in VMEM across the whole
    grid (it is re-used by every sparse row — the highest-reuse operand);
  - ja/vals ELL blocks stream through SMEM in small row tiles (scalar
    memory: the indices drive dynamic row addressing);
  - each row accumulates sum_s va[r,s] * B[ja[r,s]] with scalar-indexed
    (1, cb) row loads from VMEM — a VPU multiply-add per slot, no
    scatter anywhere (TPU scatter serializes; see spmm_device.py).

Eligibility: the panel must fit VMEM (k * cb * 4 <~ 12 MB), which the
csrmm planner's K-splitting can always arrange.  Dispatch is controlled
by FlashConfig.sparse_device_impl ('xla' default, 'pallas' opt-in) via
spmm_device.spmm_ell_block_dispatch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# B panels larger than this stay on the XLA path (VMEM is ~16 MB/core;
# leave room for the output tile, accumulator registers and double
# buffers of the SMEM index tiles).
VMEM_PANEL_LIMIT = 12 << 20


def _make_spmm_kernel(unroll: int):
    def _spmm_ell_kernel(b_ref, ja_ref, va_ref, o_ref):
        rt, rmax = ja_ref.shape
        cb = o_ref.shape[1]

        def row_body(r, _):
            # unrolled slot loop with INDEPENDENT partial accumulators:
            # the `unroll` scalar-indexed row loads per iteration stack
            # into an (unroll, cb) VPU tile (8 sublanes = the native f32
            # tile), so the adds have a dependency chain 1/unroll the
            # length of a single running (1, cb) accumulator — the chain
            # was what lost to XLA at rmax >= 128.  Final tree-sum over
            # the unroll axis happens once per row.
            def slot_body(s0, acc):
                gathered = jnp.concatenate(
                    [va_ref[r, s0 * unroll + u]
                     * b_ref[pl.ds(ja_ref[r, s0 * unroll + u], 1), :]
                     for u in range(unroll)], axis=0)
                return acc + gathered
            acc0 = jnp.zeros((unroll, cb), jnp.float32)
            acc = jax.lax.fori_loop(0, rmax // unroll, slot_body, acc0)
            o_ref[pl.ds(r, 1), :] = jnp.sum(
                acc, axis=0, keepdims=True).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, rt, row_body, 0)

    return _spmm_ell_kernel


@functools.partial(jax.jit, static_argnames=("rt", "interpret"))
def spmm_ell_pallas(b_panel, ja_ell, va_ell, *, rt: int = 8,
                    interpret: bool = False):
    """(rows, cb) = sum_s va_ell[row, s] * B[ja_ell[row, s]].

    b_panel: (k, cb) fp32, cb a multiple of 128, panel fits VMEM.
    ja_ell:  (rows, rmax) int32, rows a multiple of `rt` (to_ell pads
             rows to >= 8, so the default tile always divides).
    va_ell:  (rows, rmax) fp32; padding slots carry va == 0.
    """
    rows, rmax = ja_ell.shape
    k, cb = b_panel.shape
    assert rows % rt == 0, (rows, rt)
    unroll = 8 if rmax % 8 == 0 else (4 if rmax % 4 == 0 else 1)
    grid = (rows // rt,)
    return pl.pallas_call(
        _make_spmm_kernel(unroll),
        out_shape=jax.ShapeDtypeStruct((rows, cb), b_panel.dtype),
        grid=grid,
        in_specs=[
            # whole panel, same block every step: stays VMEM-resident
            pl.BlockSpec((k, cb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, rmax), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rt, rmax), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rt, cb), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * rmax * cb,
            bytes_accessed=(k * cb + rows * rmax * 2 + rows * cb) * 4,
            transcendentals=0),
        interpret=interpret,
    )(b_panel, ja_ell.astype(jnp.int32), va_ell)


def pallas_eligible(k: int, cb: int, rmax: int, rows: int) -> bool:
    """Dispatch heuristic, measured on v5e (docs/PERFORMANCE.md): the
    panel must fit VMEM with headroom, the lane dim must tile, rows must
    divide the row tile, and shallow ELL blocks (rmax <= 64) are where
    the VMEM-resident gather beats XLA's take+reduce (1.0-1.2x); deeper
    blocks favor XLA (0.85x at rmax=128)."""
    return (k * cb * 4 <= VMEM_PANEL_LIMIT and cb % 128 == 0
            and rows % 8 == 0 and rmax <= 64)
