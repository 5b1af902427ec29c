"""Out-of-core extreme multi-label (XML) ranking inference.

The reference paper's third flagship workload (NSDI'19 §5 Table 6:
PfastreXML / Parabel inference over bag-of-words features — >=90% of
in-memory speed at ~1/3 the DRAM) reduces, at the library level, to
scoring every document against a huge linear label model and keeping the
top-k labels per document:

    S = A W^T          A (docs x vocab) sparse CSR on flash,
                       W (labels x vocab) dense label weights on flash,
    topk(S, k)         per-document label ranking.

Neither S (docs x labels — at Table 6 scale hundreds of GB) nor W fits
DRAM, so both stream.  Two execution paths:

- **Fused device path (default on a device backend).** Per label block,
  sparse row blocks stream through the pinned tile cache; the device
  computes the ELL block product AND `lax.top_k` in one jitted step, so
  only (rows x k) scores+ids cross the link instead of (rows x lb) —
  an lb/k reduction in D2H — and the (docs x lb) score panel never
  exists anywhere.  The distance-matrix-free fused Lloyd of
  ops/kmeans.py, applied to ranking.
- **csrmm-composition path** (host sparse compute, or `mesh=`): per
  label block, S_b = A @ W_b^T lands on flash scratch via one csrmm
  pass (like the reference kmeans kernel writing its distance matrix
  to flash before the argmin pass, drivers/kmeans.cpp:94-99), then the
  running (docs x k) top-k panels merge per doc block on the host.

Peak DRAM is O(doc block x (lb + k)); every heavy pass is a library
kernel.  The reference repo ships no XML code (the paper linked the
XML systems against the library), so this is the library-level
composition, not a tree-ensemble port.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..context import get_context
from ..core.flash_array import FlashArray, flash_empty, flash_free
from ..sparse import CsrFlashMatrix, csrmm
from ..utils import LOG, Timer


@functools.lru_cache(maxsize=None)
def _topk_step(k: int):
    """jitted (b_panel (vocab, lbmax), ja_ell, va_ell, label_mask) ->
    (top-k scores, top-k label offsets): the ELL block product and the
    per-row top-k fused in one device step — the (rows x lb) score panel
    never leaves the device.  label_mask is 0 for real labels, -inf for
    the padded tail (zero-padded W columns would otherwise score 0 and
    beat real negative scores)."""
    import jax

    from ..sparse.spmm_device import spmm_ell_block

    @jax.jit
    def step(b_panel, ja_ell, va_ell, label_mask):
        s = spmm_ell_block(b_panel, ja_ell, va_ell) + label_mask[None, :]
        return jax.lax.top_k(s, k)

    return step


@functools.lru_cache(maxsize=None)
def _topk_step_sharded(mesh, k: int):
    """The fused product+top_k step row-sharded over every mesh axis:
    rows are independent, so each device top_k's its own row shard (the
    same layout as parallel/csrmm_sp.py) and only (rows x k) crosses
    ICI/host."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sparse.spmm_device import ell_gather_reduce

    axes = mesh.axis_names

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes, None), P()),
        out_specs=(P(axes, None), P(axes, None)))
    def step(b_panel, ja_ell, va_ell, label_mask):
        # per-shard body = the single-chip ELL kernel (one definition;
        # uint16 widening / bf16 promotion live in spmm_device.py)
        s = ell_gather_reduce(b_panel, ja_ell, va_ell) + label_mask[None, :]
        vals, idx = jax.lax.top_k(s, k)
        return vals, idx  # explicit tuple: top_k yields a list, which
        # would mismatch the tuple out_specs pytree

    return jax.jit(step)


def _label_axis(w: FlashArray) -> Tuple[int, int]:
    """(n_labels, vocab) for a label-weight matrix stored with one label's
    weight vector per storage line: (labels x vocab) row-major or
    (vocab x labels) column-major."""
    if len(w.shape) != 2:
        raise ValueError("W must be 2-D")
    if w.order == "R":
        return w.shape[0], w.shape[1]
    return w.shape[1], w.shape[0]


def _wt_view(w: FlashArray, b0: int, lb: int, vocab: int) -> FlashArray:
    """Zero-copy (vocab x lb) column-major view of label rows [b0, b0+lb)
    — the W_b^T operand for csrmm, no bytes moved or transposed."""
    return FlashArray(w.store, (vocab, lb), w.dtype, "C",
                      offset=w.offset + b0 * w.ld * w.itemsize,
                      ld=w.ld, ctx=w.ctx)


def _merge_topk(scores: FlashArray, labels: FlashArray, r0: int,
                s_new: np.ndarray, l_new: np.ndarray, k: int, first: bool):
    """Merge (bn, w) candidate scores/labels into the running flash-
    resident (docs, k) top-k panels at doc rows [r0, r0+bn)."""
    bn = s_new.shape[0]
    if first:
        cand_s, cand_l = s_new, l_new
    else:
        cand_s = np.concatenate([scores.read_block(r0, bn, 0, k), s_new],
                                axis=1)
        cand_l = np.concatenate([labels.read_block(r0, bn, 0, k), l_new],
                                axis=1)
    if cand_s.shape[1] > k:
        part = np.argpartition(-cand_s, k - 1, axis=1)[:, :k]
    else:  # first candidates narrower than k: pad to full width
        pad = k - cand_s.shape[1]
        cand_s = np.concatenate(
            [cand_s, np.full((bn, pad), -np.inf, np.float32)], axis=1)
        cand_l = np.concatenate(
            [cand_l, np.full((bn, pad), -1, np.int32)], axis=1)
        part = np.broadcast_to(np.arange(k), (bn, k))
    rows = np.arange(bn)[:, None]
    top_s = cand_s[rows, part]
    top_l = cand_l[rows, part]
    order = np.argsort(-top_s, axis=1, kind="stable")
    scores.write_block(r0, top_s[rows, order].astype(np.float32), 0)
    labels.write_block(r0, top_l[rows, order].astype(np.int32), 0)


def _xml_rank_fused(a: CsrFlashMatrix, w: FlashArray, k: int,
                    scores: FlashArray, labels: FlashArray,
                    lb_max: int, ctx, mesh=None) -> None:
    """Fused device path: ELL block product + lax.top_k in one jitted
    step per sparse row range — only (rows x k) crosses the link and no
    score panel is ever materialized (host, flash, or HBM).  With
    `mesh`, rows shard over the devices and each top_k's its shard."""
    import jax
    import jax.numpy as jnp

    from ..sparse import spmm_device as sdev
    from ..sparse.csr import fill_row_blocks, stream_row_blocks

    cfg = ctx.config
    docs, vocab = a.shape
    n_labels, _ = _label_axis(w)
    lb_max = max(lb_max, k)  # lax.top_k needs k <= the label axis
    ia_np = a.read_ia()
    blocks = fill_row_blocks(ia_np, cfg.max_nnzs)
    entry_cap = max(1 << 14, int(cfg.hbm_budget // 6 // max(lb_max * 4, 1)))
    if mesh is None:
        step = _topk_step(k)
        n_dev = 1
        put_rows = jnp.asarray
        put_rep = jnp.asarray
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        step = _topk_step_sharded(mesh, k)
        n_dev = int(np.prod(mesh.devices.shape))
        sh_rows = NamedSharding(mesh, P(mesh.axis_names, None))
        sh_rep = NamedSharding(mesh, P())

        from ..parallel.mesh import device_put_sharded

        def put_rows(x):
            return device_put_sharded(x, sh_rows)

        def put_rep(x):
            return device_put_sharded(x, sh_rep)

    for b0 in range(0, n_labels, lb_max):
        lb = min(lb_max, n_labels - b0)
        # (lb, vocab) contiguous label rows for either W layout
        wt_st = _wt_view(w, b0, lb, vocab).read_block_storage(0, vocab,
                                                              0, lb)
        if lb < lb_max:
            wt_pad = np.zeros((lb_max, vocab), np.float32)
            wt_pad[:lb] = wt_st
        else:
            # always float32: a non-f32 W would otherwise hand the jitted
            # top-k step two input dtypes (full-width blocks in storage
            # dtype, tail blocks f32) — an extra ~30s remote retrace and
            # dtype-dependent results between blocks
            wt_pad = wt_st.astype(np.float32, copy=False)
        if mesh is None:
            b_panel = jnp.asarray(wt_pad).T  # (vocab, lb_max), on device
        else:
            b_panel = put_rep(np.ascontiguousarray(wt_pad.T))
        mask = np.zeros(lb_max, np.float32)
        mask[lb:] = -np.inf  # padded labels must never win the top-k
        mask_dev = put_rep(mask)
        first = b0 == 0

        sort_rows = getattr(cfg, "ell_sort_rows", True)
        ell_idt = sdev.ell_idx_dtype(vocab,
                                     getattr(cfg, "ell_idx_narrow", True))
        ell_vdt = sdev.ell_val_dtype(a.vals.dtype, cfg)
        for r, e, ja_blk, va_blk in stream_row_blocks(a, ia_np, blocks,
                                                      ctx):
            blk_ia = ia_np[r:e + 1] - int(ia_np[r])
            counts = np.diff(blk_ia)
            # count-sorted ELL banding (see sparse/csrmm.py, 6.4x on
            # zipf blocks); results stage per block so the top-k merge
            # stays a contiguous panel write
            order = (np.argsort(counts, kind="stable") if sort_rows
                     else np.arange(e - r))
            s_stage = np.empty((e - r, k), np.float32)
            l_stage = np.empty((e - r, k), np.int32)
            for (s0, s1) in sdev.ell_row_ranges(counts[order], entry_cap):
                rows_sel = order[s0:s1]
                ja_ell, va_ell = sdev.to_ell_rows(
                    blk_ia, ja_blk, va_blk, rows_sel,
                    min_rows=max(8, n_dev), idx_dtype=ell_idt,
                    val_dtype=ell_vdt, counts=counts)
                vals, idx = step(b_panel, put_rows(ja_ell),
                                 put_rows(va_ell), mask_dev)
                rows_n = len(rows_sel)
                s_stage[rows_sel] = np.asarray(vals)[:rows_n]
                l_stage[rows_sel] = (np.asarray(idx)[:rows_n]
                                     + b0).astype(np.int32)
            _merge_topk(scores, labels, r, s_stage, l_stage, k, first)


def xml_rank(a: CsrFlashMatrix, w: FlashArray, k: int,
             scores_out: Optional[FlashArray] = None,
             labels_out: Optional[FlashArray] = None,
             label_blk: Optional[int] = None,
             doc_blk: Optional[int] = None,
             fused: Optional[bool] = None,
             mesh=None, ctx=None) -> Tuple[FlashArray, FlashArray]:
    """Top-k labels per document: returns (scores (docs, k) float32
    descending per row, labels (docs, k) int32).  Output panels live on
    flash (caller-provided or scratch).  `label_blk` bounds the streamed
    W panel; `doc_blk` bounds host merge memory.  With `mesh`, the
    scoring pass runs row-sharded over the device mesh
    (parallel/csrmm_sp.py); the top-k merge stays on the host.

    `fused` selects the single-device fused product+top_k path (default:
    on, unless a mesh is given or the link/problem heuristic picks host
    sparse compute — the same placement logic as csrmm)."""
    ctx = ctx or a.ctx or w.ctx or get_context()
    cfg = ctx.config
    docs, vocab = a.shape
    n_labels, w_vocab = _label_axis(w)
    if mesh is not None:
        import jax as _jx
        if _jx.process_count() > 1:
            raise ValueError(
                "xml_rank over a multi-host mesh: the score scratch and "
                "top-k merge are per-process; inference is embarrassingly "
                "parallel over docs — give each process its own doc-row "
                "slice of A and run xml_rank without a mesh (or with its "
                "process-local devices)")
    if w_vocab != vocab:
        raise ValueError(f"W vocab {w_vocab} != A vocab {vocab}")
    if not 1 <= k <= n_labels:
        raise ValueError(f"k={k} out of range [1, {n_labels}]")

    lb_max = label_blk or max(k, min(n_labels,
                                     int(cfg.program_budget // 16
                                         // max(vocab * 4, 1)) or 1,
                                     4096))
    lb_max = max(lb_max, 1)
    db = doc_blk or max(1, min(docs, (32 << 20) // max(4 * (lb_max + k), 1)))

    scores = scores_out or flash_empty((docs, k), np.float32, ctx=ctx)
    labels = labels_out or flash_empty((docs, k), np.int32, ctx=ctx)
    if scores.shape != (docs, k) or labels.shape != (docs, k):
        raise ValueError("output panels must be (docs, k)")

    timer = Timer()
    if fused is None:
        from ..sparse.csrmm import _resolve_sparse_compute
        # the fused step holds the whole (vocab x lb) W panel in HBM
        # (replicated per device under a mesh); at huge vocab fall back
        # to the composition path, whose csrmm K-splits oversized panels
        fused = (vocab * max(lb_max, k) * 4 <= cfg.hbm_budget // 3
                 and (mesh is not None
                      or _resolve_sparse_compute(cfg, docs, vocab, lb_max,
                                                 a.nnz) != "host"))
    if fused:
        _xml_rank_fused(a, w, k, scores, labels, lb_max, ctx, mesh=mesh)
        scores.store.flush()
        labels.store.flush()
        LOG.debug("xml_rank[fused%s]: %d docs x %d labels top-%d in "
                  "%.0f ms", "+mesh" if mesh is not None else "",
                  docs, n_labels, k, timer.elapsed_ms())
        return scores, labels

    s_blk = flash_empty((docs, lb_max), np.float32, ctx=ctx)
    try:
        for b0 in range(0, n_labels, lb_max):
            lb = min(lb_max, n_labels - b0)
            wt = _wt_view(w, b0, lb, vocab)
            s_view = (s_blk if lb == lb_max else
                      FlashArray(s_blk.store, (docs, lb), np.float32, "R",
                                 ld=lb_max, ctx=ctx))
            if mesh is not None:  # S_b = A @ W_b^T, row-sharded
                from ..parallel import csrmm_sharded
                csrmm_sharded(a, wt, s_view, mesh=mesh, ctx=ctx)
            else:  # single-chip out-of-core pass
                csrmm(a, wt, s_view, ctx=ctx)

            first = b0 == 0
            lab_ids = np.arange(b0, b0 + lb, dtype=np.int32)
            for r0 in range(0, docs, db):
                bn = min(db, docs - r0)
                s_new = s_view.read_block(r0, bn, 0, lb)
                _merge_topk(scores, labels, r0, s_new,
                            np.broadcast_to(lab_ids, (bn, lb)), k, first)
        scores.store.flush()
        labels.store.flush()
        LOG.debug("xml_rank: %d docs x %d labels top-%d in %.0f ms "
                  "(%d label blocks)", docs, n_labels, k,
                  timer.elapsed_ms(), -(-n_labels // lb_max))
        return scores, labels
    finally:
        flash_free(s_blk)


def xml_rank_in_mem(a_sp, w_np: np.ndarray, k: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Golden model: dense scores + full argsort (the in-memory twin's
    role, reference test strategy SURVEY §4.2)."""
    s = np.asarray(a_sp @ w_np.T, dtype=np.float32)
    order = np.argsort(-s, axis=1, kind="stable")[:, :k]
    rows = np.arange(s.shape[0])[:, None]
    return s[rows, order], order.astype(np.int32)
