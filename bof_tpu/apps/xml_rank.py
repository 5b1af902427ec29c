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
DRAM, so both stream:

  per label block W_b (lb rows of W):
    1. S_b = A @ W_b^T   one out-of-core csrmm pass (W_b^T is a zero-copy
                         column-major FlashArray view of W's bytes);
                         S_b lands on flash scratch, like the reference
                         kmeans kernel writing its distance matrix to
                         flash before the argmin pass
                         (drivers/kmeans.cpp:94-99);
    2. running top-k     stream S_b and the (docs x k) running score/label
                         panels in doc row blocks; merge on the host
                         (argpartition, memory-bound).

Peak DRAM is O(doc block x (lb + k)); every heavy pass is a library
kernel.  The reference repo ships no XML code (the paper linked the
XML systems against the library), so this is the library-level
composition, not a tree-ensemble port.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..context import get_context
from ..core.flash_array import FlashArray, flash_empty, flash_free
from ..sparse import CsrFlashMatrix, csrmm
from ..utils import LOG, Timer


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


def xml_rank(a: CsrFlashMatrix, w: FlashArray, k: int,
             scores_out: Optional[FlashArray] = None,
             labels_out: Optional[FlashArray] = None,
             label_blk: Optional[int] = None,
             doc_blk: Optional[int] = None,
             mesh=None, ctx=None) -> Tuple[FlashArray, FlashArray]:
    """Top-k labels per document: returns (scores (docs, k) float32
    descending per row, labels (docs, k) int32).  Output panels live on
    flash (caller-provided or scratch).  `label_blk` bounds the streamed
    W panel; `doc_blk` bounds host merge memory.  With `mesh`, the
    scoring pass runs row-sharded over the device mesh
    (parallel/csrmm_sp.py); the top-k merge stays on the host."""
    ctx = ctx or a.ctx or w.ctx or get_context()
    cfg = ctx.config
    docs, vocab = a.shape
    n_labels, w_vocab = _label_axis(w)
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
            for r0 in range(0, docs, db):
                bn = min(db, docs - r0)
                s_new = s_view.read_block(r0, bn, 0, lb)
                if first:
                    cand_s = s_new
                    cand_l = np.broadcast_to(
                        np.arange(b0, b0 + lb, dtype=np.int32), (bn, lb))
                else:
                    cur_s = scores.read_block(r0, bn, 0, k)
                    cur_l = labels.read_block(r0, bn, 0, k)
                    cand_s = np.concatenate([cur_s, s_new], axis=1)
                    cand_l = np.concatenate(
                        [cur_l, np.broadcast_to(
                            np.arange(b0, b0 + lb, dtype=np.int32),
                            (bn, lb))], axis=1)
                if cand_s.shape[1] > k:
                    part = np.argpartition(-cand_s, k - 1, axis=1)[:, :k]
                else:  # first block narrower than k: pad to full width
                    pad = k - cand_s.shape[1]
                    cand_s = np.concatenate(
                        [cand_s, np.full((bn, pad), -np.inf, np.float32)],
                        axis=1)
                    cand_l = np.concatenate(
                        [cand_l, np.full((bn, pad), -1, np.int32)], axis=1)
                    part = np.broadcast_to(np.arange(k), (bn, k))
                rows = np.arange(bn)[:, None]
                top_s = cand_s[rows, part]
                top_l = cand_l[rows, part]
                order = np.argsort(-top_s, axis=1, kind="stable")
                scores.write_block(r0, top_s[rows, order]
                                   .astype(np.float32), 0)
                labels.write_block(r0, top_l[rows, order]
                                   .astype(np.int32), 0)
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
