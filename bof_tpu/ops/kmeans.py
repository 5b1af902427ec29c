"""Out-of-core k-means: blocked distance kernel + Lloyd's iteration.

Re-design of the reference's kmeans stack (reference: src/blas/kmeans.cpp
:27-198 — gemm-style blocking of the point-center distance matrix;
include/tasks/kmeans_task.h:53-82 — each task computes a distance block as
one gemm plus two rank-1 norm updates; drivers/kmeans.cpp:103-189 — the
full Lloyd's iteration with argmin, center recomputation and residual).

TPU-first shape: the reference materializes the (points x centers)
distance matrix on disk, then argmins it in a second pass through mmap
(drivers/kmeans.cpp:94-99).  Here the whole Lloyd step is fused on device:
for each streamed point block we compute -2 P C^T + |c|^2 on the MXU,
argmin it, and accumulate per-center sums/counts with a one-hot MXU
matmul (scatter-free) — per-block distances never leave HBM, so a full
iteration makes exactly one pass over the points.  (|p|^2 is constant per point and omitted from the
argmin; it is added only to report inertia.)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..context import get_context
from ..core.flash_array import FlashArray
from ..core.pipeline import PrefetchSeq
from ..utils import LOG, Timer


@functools.lru_cache(maxsize=1)
def _jit_steps():
    # cached: jax.jit caches key on function identity, so rebuilding the
    # closure per lloyds_iter call would retrace/recompile every iteration
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n_centers", "prec"),
                       donate_argnums=(3, 4))
    def lloyd_block(p_blk, centers, c_norms, sums, counts, *,
                    n_centers: int, prec: str):
        from .device import _precision
        # partial distance: -2 P C^T + |c|^2  (|p|^2 constant in argmin)
        g = jnp.dot(p_blk, centers.T, precision=_precision(prec),
                    preferred_element_type=jnp.float32)
        pd = c_norms[None, :] - 2.0 * g
        labels = jnp.argmin(pd, axis=1).astype(jnp.int32)
        mind = jnp.min(pd, axis=1)
        # center accumulation as a one-hot MXU matmul — scatter-free
        # (segment_sum lowers to a serializing scatter-add on TPU)
        onehot = jax.nn.one_hot(labels, n_centers, dtype=jnp.float32)
        sums = sums + jnp.dot(onehot.T, p_blk,
                              preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        return labels, mind, sums, counts

    return lloyd_block


def lloyds_iter(points: FlashArray, centers: np.ndarray,
                labels_out: Optional[FlashArray] = None,
                blk_rows: Optional[int] = None, ctx=None
                ) -> Tuple[np.ndarray, float, np.ndarray]:
    """One Lloyd iteration: returns (new_centers, inertia, counts).

    points: flash (n, d) row-major; centers: host (k, d) (the reference
    also keeps centers in DRAM, drivers/kmeans.cpp).  If labels_out is
    given, per-point assignments are written to it (int32)."""
    import jax.numpy as jnp

    ctx = ctx or points.ctx or get_context()
    cfg = ctx.config
    n, d = points.shape
    k, d2 = centers.shape
    if d != d2:
        raise ValueError("dim mismatch")
    if points.order != "R":
        raise ValueError("points must be row-major (one point per row)")
    prec = getattr(cfg, "matmul_precision", "highest")
    blk = blk_rows or _lloyd_blk_rows(n, d, k, cfg.hbm_budget,
                                      itemsize=points.dtype.itemsize)
    from .device import dtype_native_on_device
    # fp64 always takes the host step: the jitted lloyd_block computes in
    # float32 regardless of backend x64 support, so routing by dtype (not
    # just representability) keeps FP_DOUBLE_PRECISION exact everywhere
    host_mode = (points.dtype == np.float64
                 or not dtype_native_on_device(points.dtype))
    if host_mode:
        # fp64 points on a backend that would silently narrow them (x64
        # off, or TPU's missing fp64 unit): exact host Lloyd step — BLAS
        # dgemm for the cross term, sparse-matmul center accumulation
        # (the reference's FP_DOUBLE_PRECISION build runs MKL double on
        # the host, kmeans_task.h:53-82 + bof_types.h:24-42)
        centers = np.ascontiguousarray(centers, dtype=np.float64)
        c_norms_h = np.einsum("ij,ij->i", centers, centers)
        sums_h = np.zeros((k, d), np.float64)
        counts_h = np.zeros((k,), np.float64)
    else:
        lloyd_block = _jit_steps()
        centers = np.ascontiguousarray(centers, dtype=np.float32)
        c_dev = jnp.asarray(centers)
        c_norms = jnp.sum(c_dev * c_dev, axis=1)
        sums = jnp.zeros((k, d), jnp.float32)
        counts = jnp.zeros((k,), jnp.float32)

    cache = ctx.pin_cache()
    accesses = []
    spans = []
    for r0 in range(0, n, blk):
        bn = min(blk, n - r0)
        accesses.append((points.store,) + points.block_access(r0, bn, 0, d))
        spans.append((r0, bn))
    pf = PrefetchSeq(cache, accesses, depth=cfg.pipeline_depth)

    from ..core.pipeline import TicketWindow
    inertia = 0.0
    write_tickets = TicketWindow(depth=8)
    try:
        for bi, (r0, bn) in enumerate(spans):
            p_host = pf.get(bi).view(points.dtype).reshape(bn, d)
            # einsum accumulates in f64 without materializing a full
            # f64 copy + squared temporary of the 64 MB block
            p_norm2 = float(np.einsum("ij,ij->", p_host, p_host,
                                      dtype=np.float64))
            if host_mode:
                g = p_host @ centers.T  # dgemm
                pd = c_norms_h[None, :] - 2.0 * g
                lab_np = pd.argmin(axis=1).astype(np.int32)
                inertia += float(pd.min(axis=1).sum()) + p_norm2
                counts_h += np.bincount(lab_np, minlength=k)
                import scipy.sparse as sps
                onehot = sps.csr_matrix(
                    (np.ones(bn, np.float64), lab_np,
                     np.arange(bn + 1, dtype=np.int64)), shape=(bn, k))
                sums_h += onehot.T @ p_host
            else:
                p_blk = jnp.asarray(p_host.astype(np.float32, copy=False))
                labels, mind, sums, counts = lloyd_block(
                    p_blk, c_dev, c_norms, sums, counts, n_centers=k,
                    prec=prec)
                inertia += (float(np.asarray(mind, np.float64).sum())
                            + p_norm2)
            pf.done(bi)
            if labels_out is not None:
                if not host_mode:
                    lab_np = np.asarray(labels, dtype=np.int32)
                off, sinfo = labels_out.block_access(r0, bn)
                labels_out._invalidate(off, sinfo)
                write_tickets.push(labels_out.store.write(
                    off, sinfo, lab_np.view(np.uint8).ravel()))
    finally:
        pf.close()  # an exception mid-stream must not leak pinned tiles
    write_tickets.wait_all()
    if labels_out is not None:
        labels_out.store.flush()

    if host_mode:
        counts_np, sums_np = counts_h, sums_h
    else:
        counts_np = np.asarray(counts)
        sums_np = np.asarray(sums)
    # empty clusters keep their old center (standard Lloyd fallback; the
    # reference divides unconditionally, drivers/kmeans.cpp:132-156)
    safe = np.maximum(counts_np, 1.0)[:, None]
    new_centers = np.where(counts_np[:, None] > 0, sums_np / safe, centers)
    return new_centers.astype(points.dtype), inertia, counts_np


def _lloyd_blk_rows(n: int, d: int, k: int, hbm_budget: int,
                    itemsize: int = 4) -> int:
    """Power-of-two row block shared by the streaming and HBM-resident
    Lloyd paths (CLAUDE.md: device shapes must be bucketed — each new
    shape is a ~30s remote compile), bounded by the 64 MB host tile and
    the (blk, k) one-hot intermediate.  `itemsize` is the POINT dtype's
    (8 for the fp64 host path — sizing by 4 would pin 128 MB blocks
    against the 64 MB budget and serialize the prefetch)."""
    cap = max(1024, min((64 << 20) // max(itemsize * d, 1),
                        int(hbm_budget // 8 // max(4 * k, 1))))
    return max(1, min(1 << (cap.bit_length() - 1), n))


def _device_points(points: FlashArray, ctx):
    """Upload the whole point panel to HBM once (used by kmeans_fit when
    it fits the HBM budget: multi-iteration fits then cost ONE link
    crossing total instead of one full stream per Lloyd pass).  Returns
    (p_dev (n, d) float32 device-resident, sum |p|^2 as float64).  Host
    peak is the one float32 panel — the norm accumulates per chunk via
    einsum (no full float64 temporaries)."""
    import jax
    import jax.numpy as jnp

    n, d = points.shape
    host = points.read_block(0, n, 0, d).astype(np.float32, copy=False)
    p_norm2 = 0.0
    step = max(1, (64 << 20) // max(4 * d, 1))
    for r0 in range(0, n, step):
        ch = host[r0:r0 + step]
        p_norm2 += float(np.einsum("ij,ij->", ch, ch, dtype=np.float64))
    p_dev = jax.device_put(host)
    float(np.asarray(jnp.sum(p_dev[:1, :1])))  # force the upload now
    return p_dev, p_norm2


def _lloyds_iter_device(p_dev, p_norm2: float, centers: np.ndarray,
                        labels_out: Optional[FlashArray] = None,
                        ctx=None) -> Tuple[np.ndarray, float, np.ndarray]:
    """One Lloyd iteration over HBM-resident points: the same fused
    block step as lloyds_iter, sliced from the resident panel instead of
    streamed from flash."""
    import jax.numpy as jnp

    ctx = ctx or get_context()
    cfg = ctx.config
    n, d = p_dev.shape
    k = centers.shape[0]
    prec = getattr(cfg, "matmul_precision", "highest")
    lloyd_block = _jit_steps()
    # the same bucketed block size as the streaming path, so both paths
    # share compiled lloyd_block shapes (one tail shape at most per n)
    chunk = _lloyd_blk_rows(n, d, k, cfg.hbm_budget)

    centers = np.ascontiguousarray(centers, dtype=np.float32)
    c_dev = jnp.asarray(centers)
    c_norms = jnp.sum(c_dev * c_dev, axis=1)
    sums = jnp.zeros((k, d), jnp.float32)
    counts = jnp.zeros((k,), jnp.float32)
    from ..core.pipeline import TicketWindow
    inertia = p_norm2
    write_tickets = TicketWindow(depth=8)
    for r0 in range(0, n, chunk):
        bn = min(chunk, n - r0)
        labels, mind, sums, counts = lloyd_block(
            p_dev[r0:r0 + bn], c_dev, c_norms, sums, counts,
            n_centers=k, prec=prec)
        inertia += float(np.asarray(mind, np.float64).sum())
        if labels_out is not None:
            lab_np = np.asarray(labels, dtype=np.int32)
            off, sinfo = labels_out.block_access(r0, bn)
            labels_out._invalidate(off, sinfo)
            write_tickets.push(labels_out.store.write(
                off, sinfo, lab_np.view(np.uint8).ravel()))
    write_tickets.wait_all()
    if labels_out is not None:
        labels_out.store.flush()
    counts_np = np.asarray(counts)
    sums_np = np.asarray(sums)
    safe = np.maximum(counts_np, 1.0)[:, None]
    new_centers = np.where(counts_np[:, None] > 0, sums_np / safe, centers)
    return new_centers.astype(np.float32), inertia, counts_np


def _sample_indices(n: int, s: int, rng) -> np.ndarray:
    """s distinct sorted indices from [0, n) in O(s) memory
    (rng.choice(replace=False) permutes the whole population — O(n) host
    memory, fatal for out-of-core point counts)."""
    if s >= n:
        return np.arange(n, dtype=np.int64)
    picked = np.unique(rng.integers(0, n, int(s * 1.2) + 16))
    while len(picked) < s:
        extra = rng.integers(0, n, s)
        picked = np.unique(np.concatenate([picked, extra]))
    return picked[np.sort(rng.choice(len(picked), s, replace=False))] \
        if len(picked) > s else picked


def gather_rows(points: FlashArray, idx: np.ndarray) -> np.ndarray:
    """Gather sorted row indices from a flash matrix in contiguous runs
    (one strided read per run instead of one per row)."""
    d = points.shape[1]
    out = np.empty((len(idx), d), points.dtype)
    start = 0
    while start < len(idx):
        end = start + 1
        while end < len(idx) and idx[end] == idx[end - 1] + 1:
            end += 1
        out[start:end] = points.read_block(int(idx[start]),
                                           end - start, 0, d)
        start = end
    return out


def _kmeanspp_sample(points: FlashArray, n_centers: int, rng,
                     sample_cap: int = 1 << 16) -> np.ndarray:
    """k-means++ seeding on a uniform sample of the flash points (a full
    k-means++ pass would re-stream the data k times; the sampled variant
    is the standard out-of-core compromise)."""
    n, d = points.shape
    s = min(n, max(sample_cap, 16 * n_centers))
    idx = _sample_indices(n, s, rng)
    sample = gather_rows(points, idx)
    centers = np.empty((n_centers, d), np.float64)
    centers[0] = sample[rng.integers(0, s)]
    d2 = ((sample.astype(np.float64) - centers[0]) ** 2).sum(1)
    for c in range(1, n_centers):
        total = d2.sum()
        if total <= 0:
            centers[c:] = sample[rng.choice(s, n_centers - c)]
            break
        pick = int(np.searchsorted(np.cumsum(d2), rng.random() * total))
        centers[c] = sample[min(pick, s - 1)]
        d2 = np.minimum(d2, ((sample.astype(np.float64)
                              - centers[c]) ** 2).sum(1))
    return centers.astype(points.dtype)


def kmeans_fit(points: FlashArray, n_centers: int, n_iters: int = 10,
               seed: int = 0, tol: float = 0.0, init: str = "kmeans++",
               n_init: int = 1, labels_out: Optional[FlashArray] = None,
               state_path: Optional[str] = None,
               ctx=None) -> Tuple[np.ndarray, float]:
    """Full Lloyd's loop (reference: drivers/kmeans.cpp main loop).
    init='kmeans++' seeds on a point sample; init='random' picks random
    distinct points (the reference's seeding).  n_init > 1 runs multiple
    restarts and keeps the lowest-inertia fit (each restart is a full set
    of streaming passes — budget accordingly for out-of-core data).

    HBM tier: when the whole point panel fits the HBM budget it uploads
    ONCE and every iteration/restart slices the resident panel — a
    multi-pass fit then costs one host->device crossing total (the same
    residency policy as gemm's HBM tile LRU).

    `state_path` makes the fit checkpointable (the same kernel-boundary
    durability extension as block_lanczos_svd's restart state): each
    completed iteration atomically saves (attempt, iter, centers, best);
    a rerun resumes mid-attempt from the last finished iteration.  The
    file is removed on completion."""
    import os
    ctx = ctx or points.ctx or get_context()
    cfg = ctx.config
    n, d = points.shape
    timer = Timer()
    p_dev = None
    p_norm2 = 0.0
    from .device import dtype_native_on_device
    if (points.order == "R" and n_iters > 1
            # fp64 streams through the exact host step in lloyds_iter
            and points.dtype != np.float64
            and dtype_native_on_device(points.dtype)
            and 3 * n * d * 4 <= getattr(cfg, "hbm_budget", 12 << 30)
            # the upload stages one full float32 panel in host DRAM
            and n * d * 4 <= cfg.program_budget):
        try:
            p_dev, p_norm2 = _device_points(points, ctx)
        except Exception as e:  # broken/absent accelerator: stream instead
            LOG.debug("kmeans: HBM residency unavailable (%s); streaming",
                      type(e).__name__)
            p_dev = None

    def one_iter(centers, labels_out=None):
        if p_dev is not None:
            return _lloyds_iter_device(p_dev, p_norm2, centers,
                                       labels_out=labels_out, ctx=ctx)
        return lloyds_iter(points, centers, labels_out=labels_out, ctx=ctx)

    def save_state(attempt, it, centers, best):
        tmp = state_path + ".tmp.npz"  # .npz suffix: savez won't rename it
        np.savez(tmp, attempt=attempt, it=it, centers=centers,
                 best_inertia=best[0],
                 best_centers=(best[1] if best[1] is not None
                               else np.zeros((0, 0))))
        os.replace(tmp, state_path)

    best: Tuple[float, np.ndarray] = (np.inf, None)
    start_attempt, start_it = 0, 0
    resume_centers = None
    if state_path and os.path.exists(state_path):
        with np.load(state_path) as st:
            start_attempt = int(st["attempt"])
            start_it = int(st["it"]) + 1
            resume_centers = st["centers"].astype(points.dtype)
            if st["best_centers"].size:
                best = (float(st["best_inertia"]),
                        st["best_centers"].astype(points.dtype))
        LOG.info("kmeans_fit: resuming from %s at attempt %d iter %d",
                 state_path, start_attempt, start_it)
    for attempt in range(start_attempt, max(1, n_init)):
        rng = np.random.default_rng(seed + attempt)
        if attempt == start_attempt and resume_centers is not None:
            centers = resume_centers
        elif init == "kmeans++":
            centers = _kmeanspp_sample(points, n_centers, rng)
        else:
            idx = _sample_indices(n, n_centers, rng)
            centers = np.stack([points.read_block(int(i), 1, 0, d)[0]
                                for i in idx])
        inertia = np.inf
        it0 = start_it if attempt == start_attempt else 0
        for it in range(it0, n_iters):
            centers_new, inertia, _ = one_iter(centers)
            shift = float(((centers_new - centers) ** 2).sum())
            centers = centers_new
            LOG.debug("kmeans[%d] iter %d: inertia %.6g shift %.3g "
                      "(%.0f ms)", attempt, it, inertia, shift,
                      timer.elapsed_ms())
            if state_path:
                save_state(attempt, it, centers, best)
            if shift <= tol:
                break
        if not np.isfinite(inertia):
            # resumed past this attempt's last iteration (or n_iters=0):
            # one evaluation pass so the attempt still scores into `best`
            _, inertia, _ = one_iter(centers)
        if inertia < best[0]:
            best = (inertia, centers)
    inertia, centers = best
    if labels_out is not None:
        # final assignment pass against the winning centers (also covers
        # early convergence — a previous version skipped the scheduled
        # write on early break, leaving labels_out zeroed)
        _, inertia, _ = one_iter(centers, labels_out=labels_out)
    if state_path and os.path.exists(state_path):
        os.unlink(state_path)  # state consumed on completion
    return centers, inertia


def kmeans_in_mem(points_np: np.ndarray, centers0: np.ndarray,
                  n_iters: int = 1) -> Tuple[np.ndarray, float]:
    """Golden model (reference: drivers/in_mem_kmeans.cpp) — plain numpy
    Lloyd's on fully-resident data."""
    pts = points_np.astype(np.float64)
    centers = centers0.astype(np.float64)
    inertia = np.inf
    for _ in range(n_iters):
        d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        labels = d2.argmin(1)
        inertia = float(d2.min(1).sum())
        for c in range(len(centers)):
            sel = labels == c
            if sel.any():
                centers[c] = pts[sel].mean(0)
    return centers.astype(centers0.dtype), inertia
