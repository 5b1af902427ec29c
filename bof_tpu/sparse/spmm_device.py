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

import jax
import jax.numpy as jnp
import numpy as np


def ell_gather_reduce(b_panel, ja_ell, va_ell):
    """(rows, cb) = sum_r va_ell[row, r] * B[ja_ell[row, r]].

    ELL-blocked SpMM: rows padded to the block's max row length, so the
    row reduction is a *dense* sum over the R axis — gather + VPU
    multiply-add, no scatter.  XLA's scatter-add (segment_sum) serializes
    on TPU; this formulation is the TPU-native SpMM shape (SURVEY §7
    hard-parts (b): "nnz-budgeted row blocks + gather-based kernel, ELL
    padding fallback" — ELL is the primary path, it benches ~2 orders
    faster than scatter at millions of nnz).
    ja_ell/va_ell: (rows_cap, rmax); padding entries have va == 0.
    ja_ell may arrive uint16 (narrow link transfer) — widened on device.
    va_ell may arrive bfloat16 (transfer_dtype='bfloat16') — promoted to
    the panel dtype in HBM so the reduction always accumulates at full
    panel precision.

    This raw (un-jitted) body is THE single definition of the ELL
    product: the sharded step bodies (parallel/csrmm_sp.py,
    apps/xml_rank.py) trace it inside shard_map, so a transfer-dtype
    change lands everywhere at once.
    """
    g = jnp.take(b_panel, ja_ell.astype(jnp.int32).reshape(-1), axis=0)
    g = g.reshape(ja_ell.shape + (b_panel.shape[1],))   # (rows, rmax, cb)
    va_ell = promote_ell_vals(va_ell, b_panel.dtype)
    # explicit multiply + reduce (VPU): an einsum here would lower to a
    # rows-batched matmul, which compiles/executes poorly at 10k+ batches
    return jnp.sum(va_ell[:, :, None] * g, axis=1)


def promote_ell_vals(va_ell, dtype):
    """Widen link-compressed ELL values to the panel dtype IN HBM, so
    the reduce always accumulates at full panel precision.  va_ell is
    either an array (f32 / bf16 link dtypes) or an
    (int8 values, f32 per-row scale) pair from `quantize_ell_i8`
    (transfer_dtype='int8')."""
    if isinstance(va_ell, tuple):
        va_i8, row_scale = va_ell
        return va_i8.astype(dtype) * row_scale[:, None].astype(dtype)
    return va_ell.astype(dtype)


spmm_ell_block = jax.jit(ell_gather_reduce)


def spmm_ell_block_dispatch(b_panel, ja_ell, va_ell, impl: str = "auto"):
    """Route one ELL block product to the XLA take+reduce kernel or the
    explicit Pallas VMEM-gather kernel (sparse/spmm_pallas.py).
    impl: 'xla' | 'pallas' | 'auto' (FlashConfig.sparse_device_impl) —
    'auto' uses the measured v5e heuristic (pallas_eligible) on TPU and
    XLA everywhere else.  Quantized (tuple) values always take the XLA
    body — the Pallas kernel consumes plain arrays."""
    if impl != "xla" and not isinstance(va_ell, tuple):
        from .spmm_pallas import (pallas_eligible, pallas_feasible,
                                  spmm_ell_pallas)
        rows, rmax = ja_ell.shape
        k, cb = b_panel.shape
        feasible = pallas_feasible(k, cb, rmax, rows)
        want = (impl == "pallas" and feasible) or (
            impl == "auto" and feasible
            and pallas_eligible(k, cb, rmax, rows)
            and jax.default_backend() == "tpu")
        if want:
            return spmm_ell_pallas(b_panel, ja_ell, va_ell)
    return spmm_ell_block(b_panel, ja_ell, va_ell)


@jax.jit
def spmv_ell_block(x, ja_ell, va_ell):
    """y_blk[row] = sum_r va_ell[row, r] * x[ja_ell[row, r]] (csrgemv 'N')."""
    g = jnp.take(x, ja_ell.astype(jnp.int32).reshape(-1)
                 ).reshape(ja_ell.shape)
    return jnp.sum(promote_ell_vals(va_ell, x.dtype) * g, axis=1)


def pad_to_cap(arr: np.ndarray, cap: int, fill=0):
    if len(arr) == cap:
        return arr
    out = np.full((cap,) + arr.shape[1:], fill, arr.dtype)
    out[:len(arr)] = arr
    return out


def expand_row_ids(ia_blk: np.ndarray) -> np.ndarray:
    """Per-nnz block-local row ids from an offsets slice ia[r0..r1]."""
    counts = np.diff(ia_blk)
    return np.repeat(np.arange(len(counts), dtype=np.int32), counts)


def _round_up_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def ell_dims(counts: np.ndarray, min_rows: int = 8):
    """(rows_pad, rmax) of the ELL block `to_ell` would build for these
    row counts — the single source of truth, so multi-host shard
    builders (which pass the GLOBAL dims explicitly) always agree with
    the local conversion."""
    rows = len(counts)
    rmax = max(1, _round_up_pow2(int(counts.max()) if rows else 1))
    rows_pad = max(8, _round_up_pow2(rows))
    if min_rows > 1:
        rows_pad = ((max(rows_pad, min_rows) + min_rows - 1)
                    // min_rows) * min_rows
    return rows_pad, rmax


def ell_idx_dtype(k_panel: int, narrow: bool = True):
    """Link dtype for ELL column indices.  The ja half of every ELL
    upload is pure transfer bytes (device kernels widen to int32 in
    HBM), so when every block-local index fits 16 bits — panel height
    <= 65536, which covers every bucketed column block and most K-split
    ranges — uint16 halves the index bytes (25% of the ELL total) on a
    link-bound path.  Deterministic in (k_panel, narrow): multi-host
    shard builders all see the global panel height, so every process
    picks the same dtype."""
    return np.uint16 if narrow and 0 < k_panel <= 65536 else np.int32


def ell_val_dtype(storage_dtype, cfg):
    """Link dtype for ELL values.  With transfer_dtype='bfloat16' (the
    same opt-in that halves gemm's A/B tiles, config.py) fp32 values are
    rounded to bf16 on the host and promoted back to the panel dtype in
    HBM — halving the va half of every ELL upload for deployments that
    accept ~4e-3 relative input rounding.  fp64 storage opts out (the
    CPU x64 path is chosen FOR precision).  'int8' fills at float32 and
    quantizes AFTER the ELL build (`ell_val_quantize` + `quantize_ell_i8`
    — scales are per ROW, so they need the padded layout first)."""
    if (getattr(cfg, "transfer_dtype", "float32") == "bfloat16"
            and np.dtype(storage_dtype) == np.float32):
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(storage_dtype)


def ell_val_quantize(storage_dtype, cfg) -> bool:
    """True when ELL values should ship int8 (transfer_dtype='int8',
    f32 storage): va bytes/nnz drop 4 -> 1 (vs bf16's 2), the last
    honest compression step on a link-bound sparse upload.  Unlike
    gemm's per-tile scale, the scale here is per ROW — on power-law
    (bag-of-words) rows a block-wide max-abs would crush small rows'
    values to zero, while a row's own max keeps every value within
    1/254 of ITS row max (~0.4% row-relative band).  The promoted
    product still accumulates at panel precision (`promote_ell_vals`).
    fp64 opts out like bf16; the sharded/xml_rank shard_map paths keep
    array values (their in_specs are per-array)."""
    return (getattr(cfg, "transfer_dtype", "float32") == "int8"
            and np.dtype(storage_dtype) == np.float32)


def quantize_ell_i8(va_ell: np.ndarray):
    """(int8 values, f32 per-row scale) for a padded ELL value block.
    Padding entries are exact zeros and stay exact; an all-zero row gets
    scale 1.0 (nothing to represent).  Roundtrip: va ~= i8 * scale[:,None]
    with error <= scale/2 per entry.  Same guard semantics as the dense
    quantize_i8 (io/native.py): NaN-ignoring row amax and a +/-127 clamp
    — without them one non-finite entry poisons its row's scale and the
    finite neighbours wrap through the int8 cast into plausible garbage."""
    amax = np.fmax.reduce(np.abs(va_ell), axis=1, initial=0.0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    with np.errstate(invalid="ignore"):
        q = np.clip(np.rint(va_ell / scale[:, None]), -127, 127)
        q = np.nan_to_num(q, nan=0.0).astype(np.int8)
    return q, scale


def _ell_fill(starts: np.ndarray, counts: np.ndarray,
              ja_blk: np.ndarray, va_blk: np.ndarray,
              min_rows: int, rmax: int, rows_pad: int,
              idx_dtype=np.int32, val_dtype=None):
    rows = len(counts)
    d_rows_pad, d_rmax = ell_dims(counts, min_rows)
    rmax = rmax or d_rmax
    rows_pad = rows_pad or d_rows_pad
    if rows > rows_pad:
        raise ValueError(f"rows {rows} exceed rows_pad {rows_pad}")
    if len(ja_blk):
        # native single-pass gather (io/native.py ell_fill) — the numpy
        # formulation below builds ~6 full-size temporaries and was the
        # dominant 'N'-path prep term in the csrgemv/csrmm stage
        # partitions; bit-identical output, numpy fallback otherwise
        from ..io.native import ell_fill
        nat = ell_fill(starts, counts, ja_blk, va_blk, rows_pad, rmax,
                       idx_dtype, val_dtype)
        if nat is not None:
            return nat
    slots = np.arange(rmax, dtype=np.int64)[None, :]
    idx = np.minimum(starts[:, None] + slots, max(len(ja_blk) - 1, 0))
    mask = slots < counts[:, None]
    ja_ell = np.zeros((rows_pad, rmax), idx_dtype)
    va_ell = np.zeros((rows_pad, rmax), val_dtype or va_blk.dtype)
    if len(ja_blk):
        ja_ell[:rows] = np.where(mask, ja_blk[idx], 0).astype(idx_dtype)
        va_ell[:rows] = np.where(mask, va_blk[idx], 0)
    return ja_ell, va_ell


def to_ell(ia_blk: np.ndarray, ja_blk: np.ndarray, va_blk: np.ndarray,
           min_rows: int = 8, rmax: int = 0, rows_pad: int = 0,
           idx_dtype=np.int32, val_dtype=None):
    """Convert a CSR row block to padded ELL (reference stores blocks CSR
    and calls MKL per block, csrmm_task.h; the ELL layout is the
    TPU-friendly equivalent).  Returns (ja_ell, va_ell) of shape
    (rows_pad, rmax) — both power-of-two bucketed so only O(log^2) kernel
    shapes ever compile.  Padding entries: ja=0, va=0 (contribute
    nothing).  rows_pad is additionally a multiple of `min_rows` so
    sharded callers can split rows evenly over a device mesh.  Explicit
    `rmax`/`rows_pad` override the derived values — multi-host shard
    builders pass the GLOBAL block's dimensions so every process's shard
    agrees (a local max would give shards incompatible shapes)."""
    counts = np.diff(ia_blk).astype(np.int64)
    base = int(ia_blk[0])
    starts = ia_blk[:-1] - base
    return _ell_fill(starts, counts, ja_blk, va_blk, min_rows, rmax,
                     rows_pad, idx_dtype, val_dtype)


def to_ell_rows(ia_blk: np.ndarray, ja_blk: np.ndarray,
                va_blk: np.ndarray, rows_sel: np.ndarray,
                min_rows: int = 8, idx_dtype=np.int32, val_dtype=None,
                counts: np.ndarray = None):
    """ELL of an arbitrary row SELECTION of a block (rows_sel indexes
    into the block's rows).  Used by count-sorted ELL banding: sorting
    rows by nnz before ranging makes each band's rmax tight to its own
    rows instead of the block max, cutting ELL padding bytes/FLOPs on
    skewed distributions (bag-of-words matrices are power-law).  The
    caller scatters the output rows back through the same selection.

    `counts` (the block's full np.diff(ia_blk), int64) can be passed by
    callers that already computed it — a skewed block split into B bands
    would otherwise redo the O(rows) diff per band in the prep hot
    stage."""
    if counts is None:
        counts = np.diff(ia_blk).astype(np.int64)
    base = int(ia_blk[0])
    starts = (ia_blk[:-1] - base)[rows_sel]
    return _ell_fill(starts, counts[rows_sel], ja_blk, va_blk, min_rows,
                     0, 0, idx_dtype, val_dtype)


def ell_row_ranges(counts: np.ndarray, entry_cap: int):
    """Split rows [0, len(counts)) into ranges whose padded ELL size
    (rows_pad * rmax_pad) stays under entry_cap — bounds device memory
    for skewed blocks (a mega-row gets a range of its own)."""
    n = len(counts)
    ranges = []
    s = 0
    cur_max = 1
    for r in range(n):
        c = max(1, int(counts[r]))
        new_max = max(cur_max, c)
        rows = r - s + 1
        if (rows > 1 and _round_up_pow2(rows) * _round_up_pow2(new_max)
                > entry_cap):
            ranges.append((s, r))
            s = r
            cur_max = c
        else:
            cur_max = new_max
    if s < n or not ranges:
        ranges.append((s, n))
    return ranges
