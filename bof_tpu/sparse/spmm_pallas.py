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
            # unrolled slot loop: `unroll` scalar-indexed row loads per
            # iteration expose DMA/ILP to Mosaic.  A 6-way 40-iter A/B
            # on v5e (chain vs independent-partial accumulators, unroll
            # 4/8/16) found the serial chain with unroll=16 fastest at
            # every rmax 32-256 (docs/PERFORMANCE.md r3) — the partials
            # variant's concat + final tree-sum costs more than the
            # shorter dependency chain saves.
            def slot_body(s0, acc):
                for u in range(unroll):
                    s = s0 * unroll + u
                    acc = acc + va_ref[r, s] * b_ref[pl.ds(ja_ref[r, s], 1), :]
                return acc
            acc0 = jnp.zeros((1, cb), jnp.float32)
            o_ref[pl.ds(r, 1), :] = jax.lax.fori_loop(
                0, rmax // unroll, slot_body, acc0).astype(o_ref.dtype)
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
    unroll = next((u for u in (16, 8, 4) if rmax % u == 0), 1)
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
    )(b_panel, ja_ell.astype(jnp.int32), va_ell.astype(b_panel.dtype))


def pallas_feasible(k: int, cb: int, rmax: int, rows: int) -> bool:
    """Hard constraints only: the panel must fit VMEM with headroom, the
    lane dim must tile, rows must divide the row tile."""
    return (k * cb * 4 <= VMEM_PANEL_LIMIT and cb % 128 == 0
            and rows % 8 == 0)


def pallas_eligible(k: int, cb: int, rmax: int, rows: int) -> bool:
    """Auto-dispatch PROFIT heuristic, re-measured on v5e in round 3
    (40-iteration paired A/B at rows=16384, k=8192, cb=256 — enough
    iterations to amortize the ~27 ms tunnel sync that polluted the
    round-2 3-iteration numbers): XLA's take+reduce wins at EVERY rmax
    32-256 (best Pallas variant, chain/unroll-16, reaches only
    0.75-0.84x).  The round-2 'pallas wins at shallow rmax' finding was
    measurement noise.  'auto' therefore never picks the Pallas kernel;
    it remains available via sparse_device_impl='pallas' (subject to
    pallas_feasible) for transports/shapes where a user measures a
    win."""
    return False
