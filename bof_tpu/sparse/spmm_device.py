"""Device-side sparse block compute (gather + segment-sum).

TPU-native replacement for the reference's per-task MKL sparse calls
(reference: mkl_scsrmm in SimpleCsrmmRmTask::execute, csrmm_task.h:201-229;
mkl_cspblas_scsrgemv in csrgemv_task.h): a CSR row-block becomes three
padded device vectors (ja, vals, row_ids) and the block product is

    C_blk = segment_sum(vals[:, None] * B_panel[ja], row_ids)

— a gather feeding a VPU multiply and a segment reduction.  CSR SpMM is
memory-bound (SURVEY §7 hard-parts (b)), so the gather path is the right
roofline; padding to fixed capacities keeps one compiled shape per kernel.
Padding rows carry vals == 0 and row_id == rows_cap-1, contributing nothing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("rows_cap",))
def spmm_block(b_panel, ja, vals, row_ids, *, rows_cap: int):
    """(rows_cap, cb) = sum over nnz of vals * B[ja] grouped by row."""
    g = jnp.take(b_panel, ja, axis=0)          # (nnz_cap, cb)
    contrib = vals[:, None] * g
    return jax.ops.segment_sum(contrib, row_ids, num_segments=rows_cap)


@functools.partial(jax.jit, static_argnames=("rows_cap",))
def spmv_block(x, ja, vals, row_ids, *, rows_cap: int):
    """y_blk[r] = sum vals * x[ja] grouped by row (csrgemv 'N')."""
    contrib = vals * jnp.take(x, ja)
    return jax.ops.segment_sum(contrib, row_ids, num_segments=rows_cap)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def spmv_t_block(y, x_rows, ja, vals, row_ids, *, k: int):
    """y += A_blk^T x_blk: scatter contributions over columns
    (csrgemv 'T'; the reference accumulates per-block partials under a
    mutex, csrgemv_task.h:169-176 — here XLA dataflow serializes the
    donated accumulator)."""
    contrib = vals * jnp.take(x_rows, row_ids)
    return y + jax.ops.segment_sum(contrib, ja, num_segments=k)


@functools.partial(jax.jit, donate_argnums=(0,))
def axpby_rows(c_blk, out_rows, alpha, beta):
    """C_rows = alpha*out_rows + beta*C_rows."""
    return beta.astype(c_blk.dtype) * c_blk + alpha.astype(c_blk.dtype) * out_rows


def pad_to_cap(arr: np.ndarray, cap: int, fill=0):
    if len(arr) == cap:
        return arr
    out = np.full((cap,) + arr.shape[1:], fill, arr.dtype)
    out[:len(arr)] = arr
    return out


def expand_row_ids(ia_blk: np.ndarray, r0: int) -> np.ndarray:
    """Per-nnz local row ids from an offsets slice ia[r0..r1]."""
    counts = np.diff(ia_blk)
    return np.repeat(np.arange(len(counts), dtype=np.int32), counts)
