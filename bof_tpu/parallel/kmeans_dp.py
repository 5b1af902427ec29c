"""Data-parallel Lloyd step over a device mesh.

New capability beyond the single-node reference (SURVEY §2.6): the fused
Lloyd block step of ops/kmeans.py, sharded point-wise over all mesh
devices.  Each device computes assignments for its point shard on its MXU
and reduces per-center sums/counts with `psum` over the flattened mesh —
the collective rides ICI; centers stay replicated.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np


@functools.lru_cache(maxsize=None)
def dp_lloyd_step(mesh, prec: str = "highest"):
    """Returns jitted step(points, weights, centers) ->
    (sums, counts, inertia_part, labels): points/weights sharded over
    every mesh axis on dim 0, the statistics replicated (psum-reduced
    over ICI), labels sharded like the points."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.device import _precision

    axes = mesh.axis_names

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(axes), P()),
        out_specs=(P(), P(), P(), P(axes)))
    def step(p_loc, w_loc, centers):
        # w_loc: 1.0 for real points, 0.0 for shard-padding rows.  Pad rows
        # are masked out of every statistic explicitly — relying on exact
        # fp32 tie-breaking to route pad points to a known center is not
        # sound (pd is computed with independent roundings per center).
        c_norms = jnp.sum(centers * centers, axis=1)
        g = jnp.dot(p_loc, centers.T, precision=_precision(prec),
                    preferred_element_type=jnp.float32)
        pd = c_norms[None, :] - 2.0 * g
        labels = jnp.argmin(pd, axis=1)
        mind = jnp.min(pd, axis=1)
        onehot = jax.nn.one_hot(labels, centers.shape[0],
                                dtype=jnp.float32) * w_loc[:, None]
        sums = jnp.dot(onehot.T, p_loc, preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        inertia = jnp.sum(mind * w_loc) + jnp.sum(
            (p_loc * p_loc) * w_loc[:, None])
        for ax in axes:
            sums = jax.lax.psum(sums, ax)
            counts = jax.lax.psum(counts, ax)
            inertia = jax.lax.psum(inertia, ax)
        return sums, counts, inertia[None], labels.astype(jnp.int32)

    return jax.jit(step)


def lloyds_iter_sharded(points_np: np.ndarray, centers: np.ndarray,
                        mesh=None, prec: str = "highest"):
    """One data-parallel Lloyd iteration over host-resident points
    (the out-of-core loop feeds successive shards through this step)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import device_put_sharded, make_mesh

    mesh = mesh or make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    n, d = points_np.shape
    if points_np.dtype == np.float64:
        raise ValueError(
            "sharded Lloyd computes in float32 and cannot represent "
            "float64 points exactly; use ops.kmeans.lloyds_iter for fp64")
    pad = (-n) % n_dev
    centers = np.ascontiguousarray(centers, np.float32)
    weights = np.ones(n + pad, np.float32)
    if pad:
        # pad rows are zero-weighted in the device step, so their values
        # are irrelevant — zeros keep the shard shapes uniform
        points_np = np.concatenate([points_np, np.zeros((pad, d))])
        weights[n:] = 0.0
    step = dp_lloyd_step(mesh, prec)
    sh = NamedSharding(mesh, P(mesh.axis_names))
    p = device_put_sharded(points_np.astype(np.float32), sh)
    w = device_put_sharded(weights, sh)
    c = device_put_sharded(centers, NamedSharding(mesh, P()))
    sums, counts, inertia, _labels = step(p, w, c)
    sums = np.array(sums)
    counts = np.array(counts)
    inertia = float(np.asarray(inertia).sum())
    safe = np.maximum(counts, 1.0)[:, None]
    new_centers = np.where(counts[:, None] > 0, sums / safe, centers)
    return new_centers.astype(np.float32), inertia, counts


def _row_shard_spans(sh, rows_pad: int, d: int):
    """[(device, p0, p1)] padded-row spans per addressable device of a
    (rows_pad, d) dim0-sharded array, in deterministic row order."""
    out = []
    for dev, idx in sh.addressable_devices_indices_map(
            (rows_pad, d)).items():
        s = idx[0]
        out.append((dev, s.start or 0,
                    rows_pad if s.stop is None else s.stop))
    return sorted(out, key=lambda t: t[1])


def lloyds_iter_ooc_sharded(points, centers: np.ndarray,
                            labels_out=None, mesh=None,
                            blk_rows: Optional[int] = None,
                            prec: str = "highest", ctx=None):
    """One Lloyd iteration over FLASH-resident points, each streamed block
    data-parallel over the mesh: the out-of-core structure of
    ops/kmeans.lloyds_iter with dp_lloyd_step as the device step.  Blocks
    prefetch through the pinned tile cache; center statistics psum over
    ICI per block and accumulate on the host.  Returns
    (new_centers, inertia, counts).

    Multi-host data plane (mirrors gemm_sharded/csrmm_sharded): under
    `jax.process_count() > 1`, each process READS only the point rows its
    devices own (per-shard sub-accesses — no H-fold read amplification),
    uploads them per device, and writes back only its devices' label
    rows; the statistics are psum-replicated so every process folds the
    same sums."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..context import get_context
    from ..core.pipeline import PrefetchSeq
    from .mesh import _FORCE_SHARDED_READS, device_put_sharded, make_mesh

    ctx = ctx or points.ctx or get_context()
    cfg = ctx.config
    mesh = mesh or make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    n, d = points.shape
    if points.order != "R":
        raise ValueError("points must be row-major (one point per row)")
    if points.dtype == np.float64:
        # device-only path: the float32 Lloyd step would silently crush
        # fp64 structure (ops/kmeans.lloyds_iter routes this to an exact
        # host step; there is no sharded host step)
        raise ValueError(
            "sharded Lloyd computes in float32 and cannot represent "
            "float64 points exactly; use ops.kmeans.lloyds_iter / "
            "kmeans_fit (exact host step) for fp64")
    kc = centers.shape[0]
    centers = np.ascontiguousarray(centers, np.float32)

    blk = blk_rows or max(1, min(n, (64 << 20) // max(4 * d, 1)))
    blk = ((blk + n_dev - 1) // n_dev) * n_dev  # shards stay uniform

    step = dp_lloyd_step(mesh, prec)
    sh = NamedSharding(mesh, P(mesh.axis_names))
    c_dev = device_put_sharded(centers, NamedSharding(mesh, P()))

    multihost = jax.process_count() > 1
    sharded_reads = multihost or _FORCE_SHARDED_READS
    cache = ctx.pin_cache()
    spans = [(r0, min(blk, n - r0)) for r0 in range(0, n, blk)]
    if sharded_reads:
        flat: list = []
        plans = []
        for (r0, bn) in spans:
            rows_pad = bn + (-bn) % n_dev
            entries = []
            for (dev, p0, p1) in _row_shard_spans(sh, rows_pad, d):
                lo, hi = r0 + p0, r0 + min(p1, bn)
                pidx = None
                if hi > lo:
                    pidx = len(flat)
                    flat.append((points.store,)
                                + points.block_access(lo, hi - lo, 0, d))
                entries.append((dev, p0, p1, lo, hi, pidx))
            plans.append((rows_pad, entries))
        pf = PrefetchSeq(cache, flat, depth=cfg.pipeline_depth * n_dev)
    else:
        accesses = [(points.store,) + points.block_access(r0, bn, 0, d)
                    for r0, bn in spans]
        pf = PrefetchSeq(cache, accesses, depth=cfg.pipeline_depth)

    sums = np.zeros((kc, d), np.float64)
    counts = np.zeros(kc, np.float64)
    inertia = 0.0
    from ..core.pipeline import TicketWindow
    write_tickets = TicketWindow(depth=8)
    try:
        for bi, (r0, bn) in enumerate(spans):
            if sharded_reads:
                rows_pad, entries = plans[bi]
                p_shards, w_shards = [], []
                for (dev, p0, p1, lo, hi, pidx) in entries:
                    rs = p1 - p0
                    pshard = np.zeros((rs, d), np.float32)
                    wshard = np.zeros(rs, np.float32)
                    if pidx is not None:
                        raw = pf.get(pidx).view(points.dtype)
                        pshard[:hi - lo] = raw.reshape(hi - lo, d)
                        wshard[:hi - lo] = 1.0
                        pf.done(pidx)
                    p_shards.append(jax.device_put(pshard, dev))
                    w_shards.append(jax.device_put(wshard, dev))
                p_g = jax.make_array_from_single_device_arrays(
                    (rows_pad, d), sh, p_shards)
                w_g = jax.make_array_from_single_device_arrays(
                    (rows_pad,), sh, w_shards)
                s, c, i, labels = step(p_g, w_g, c_dev)
            else:
                p_host = pf.get(bi).view(points.dtype).reshape(bn, d)
                pad = (-bn) % n_dev
                w_np = np.ones(bn + pad, np.float32)
                if pad:
                    p_host = np.concatenate(
                        [p_host, np.zeros((pad, d), points.dtype)])
                    w_np[bn:] = 0.0
                s, c, i, labels = step(
                    device_put_sharded(
                        p_host.astype(np.float32, copy=False), sh),
                    device_put_sharded(w_np, sh), c_dev)
                pf.done(bi)
            sums += np.asarray(s, np.float64)
            counts += np.asarray(c, np.float64)
            inertia += float(np.asarray(i).sum())
            if labels_out is not None:
                if multihost:
                    # the global labels array spans devices this process
                    # cannot fetch: persist each addressable shard's real
                    # rows (union across processes covers the block)
                    for shard in labels.addressable_shards:
                        p0 = shard.index[0].start or 0
                        p1 = (shard.index[0].stop
                              if shard.index[0].stop is not None
                              else len(labels))
                        lo, hi = r0 + p0, r0 + min(p1, bn)
                        if hi <= lo:
                            continue
                        lab_np = np.ascontiguousarray(
                            np.asarray(shard.data, np.int32)[:hi - lo])
                        off, sinfo = labels_out.block_access(lo, hi - lo)
                        labels_out._invalidate(off, sinfo)
                        write_tickets.push(labels_out.store.write(
                            off, sinfo, lab_np.view(np.uint8).ravel()))
                else:
                    lab_np = np.asarray(labels, np.int32)[:bn]
                    off, sinfo = labels_out.block_access(r0, bn)
                    labels_out._invalidate(off, sinfo)
                    write_tickets.push(labels_out.store.write(
                        off, sinfo, lab_np.view(np.uint8).ravel()))
    finally:
        pf.close()
    write_tickets.wait_all()
    if labels_out is not None:
        labels_out.store.flush()
    safe = np.maximum(counts, 1.0)[:, None]
    new_centers = np.where(counts[:, None] > 0, sums / safe, centers)
    return new_centers.astype(np.float32), inertia, counts


def kmeans_fit_sharded(points, n_centers: int, n_iters: int = 10,
                       seed: int = 0, tol: float = 1e-4, labels_out=None,
                       mesh=None, ctx=None):
    """Full out-of-core Lloyd's over the mesh (the multi-chip analog of
    ops/kmeans.kmeans_fit; the reference's driver loop is
    drivers/kmeans.cpp:103-189).  Seeds with sampled k-means++ like the
    single-chip fit.  Returns (centers, inertia).

    HBM tier (mirrors the single-chip fit): when the point panel fits the
    mesh's aggregate HBM budget, it is sharded onto the devices ONCE and
    every iteration runs over the resident shards — a multi-pass fit
    costs one host->device crossing total."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..context import get_context
    from ..ops.kmeans import _kmeanspp_sample
    from .mesh import device_put_sharded, make_mesh

    ctx = ctx or getattr(points, "ctx", None) or get_context()
    cfg = ctx.config
    mesh = mesh or make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    n, d = points.shape
    if points.dtype == np.float64:
        raise ValueError(
            "kmeans_fit_sharded computes in float32 and cannot represent "
            "float64 points exactly; use ops.kmeans.kmeans_fit (exact "
            "host Lloyd step) for fp64")
    k = n_centers
    rng = np.random.default_rng(seed)
    centers = _kmeanspp_sample(points, n_centers, rng)

    resident = None
    if (points.order == "R" and n_iters > 1
            # the resident upload reads the WHOLE panel and the label
            # write-back fetches the global array — single-process only;
            # multi-process fits stream via lloyds_iter_ooc_sharded,
            # whose data plane is shard-local end to end
            and jax.process_count() == 1
            # sharded panel + one-hot per device, against aggregate HBM
            and 3 * n * (d + k) * 4 <= cfg.hbm_budget * n_dev
            # the upload stages one full float32 panel in host DRAM
            and n * d * 4 <= cfg.program_budget):
        try:
            host = points.read_block(0, n, 0, d).astype(np.float32,
                                                        copy=False)
            pad = (-n) % n_dev
            w_np = np.ones(n + pad, np.float32)
            if pad:
                host = np.concatenate(
                    [host, np.zeros((pad, d), np.float32)])
                w_np[n:] = 0.0
            sh = NamedSharding(mesh, P(mesh.axis_names))
            resident = (device_put_sharded(host, sh),
                        device_put_sharded(w_np, sh))
        except Exception:
            resident = None  # stream instead

    prec = getattr(cfg, "matmul_precision", "highest")
    step = dp_lloyd_step(mesh, prec)
    rep = NamedSharding(mesh, P())

    def one_iter(c_np, want_labels):
        if resident is None:
            return lloyds_iter_ooc_sharded(
                points, c_np, labels_out=labels_out if want_labels
                else None, mesh=mesh, ctx=ctx)
        p_sh, w_sh = resident
        c_dev = device_put_sharded(np.ascontiguousarray(c_np, np.float32), rep)
        sums, counts, inertia, labels = step(p_sh, w_sh, c_dev)
        sums, counts = np.asarray(sums), np.asarray(counts)
        if want_labels and labels_out is not None:
            lab_np = np.asarray(labels, np.int32)[:n]
            off, sinfo = labels_out.block_access(0, n)
            labels_out._invalidate(off, sinfo)
            labels_out.store.write(off, sinfo,
                                   lab_np.view(np.uint8).ravel()).wait()
            labels_out.store.flush()
        safe = np.maximum(counts, 1.0)[:, None]
        new_c = np.where(counts[:, None] > 0, sums / safe, c_np)
        return (new_c.astype(np.float32),
                float(np.asarray(inertia).sum()), counts)

    prev = None
    inertia = 0.0
    for it in range(n_iters):
        last = it == n_iters - 1
        centers, inertia, _ = one_iter(centers, want_labels=last)
        if prev is not None and abs(prev - inertia) <= tol * max(prev, 1.0):
            if labels_out is not None and not last:
                _, inertia, _ = one_iter(centers, want_labels=True)
            break
        prev = inertia
    return centers, inertia
