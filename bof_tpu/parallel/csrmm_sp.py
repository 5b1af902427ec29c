"""Sharded out-of-core sparse x dense matmul over a device mesh.

New capability beyond the single-node reference (SURVEY §2.6): the csrmm
block product distributed row-wise over every mesh device.  Layout:

    B column panel: replicated              P()
    ELL block (ja/vals): rows sharded       P(axes, None)
    C row slice: rows sharded               P(axes, None)

Sparse rows are independent, so the natural sharding is pure row data
parallelism — no collective is needed in the product itself; ICI only
carries the (tiny) replicated-B broadcast.  Each device gathers its row
shard's B rows on its own MXU/VPU, which is exactly how the single-chip
ELL kernel works (sparse/spmm_device.py — scatter-free by design).

The planner streams nnz-budgeted row blocks (reference: fill_blocks,
blas_utils.h:84-97) through the pinned tile cache with prefetch lookahead,
like sparse/csrmm.py's single-chip pipeline.
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def sharded_spmm_step(mesh):
    """jitted (b_panel, ja_ell, va_ell) -> C rows, rows sharded over every
    mesh axis, B replicated.  lru_cached so repeated planner calls reuse
    jax.jit's trace cache (a fresh closure per call would retrace)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..sparse.spmm_device import ell_gather_reduce

    axes = mesh.axis_names

    # per-shard body IS the single-chip ELL kernel (one definition:
    # uint16 widening / bf16 promotion changes land here automatically)
    step = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axes, None), P(axes, None)),
        out_specs=P(axes, None))(ell_gather_reduce)

    return jax.jit(step)


def csrmm_sharded(a, b, c, alpha: float = 1.0, beta: float = 0.0,
                  mesh=None, ctx=None) -> None:
    """C = alpha * A B + beta * C with flash-resident CSR A, every block
    product row-sharded over the mesh.  B column panels must fit HBM
    replicated (project-to-low-dim workloads, paper Table 3 shape)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..context import get_context
    from ..core.pipeline import PrefetchSeq
    from ..sparse import spmm_device as sdev
    from ..sparse.csr import fill_row_blocks
    from .mesh import device_put_sharded, make_mesh

    ctx = ctx or b.ctx or get_context()
    cfg = ctx.config
    mesh = mesh or make_mesh()
    axes = mesh.axis_names
    n_dev = int(np.prod(mesh.devices.shape))

    m, k = a.shape
    if b.shape[0] != k or c.shape != (m, b.shape[1]):
        raise ValueError("operand shapes inconsistent")
    from ..core.flash_array import check_output_distinct
    check_output_distinct(c, b=b, ia=a.ia, ja=a.ja, vals=a.vals)
    from ..core.tiled_array import reject_tiled
    reject_tiled((("b", b), ("c", c)),
                 "csrmm_sharded's row blocks are nnz-adaptive and cannot "
                 "align to a tile grid; use flat operands (the single-"
                 "host csrmm handles tile-major C via RMW windows)")
    n = b.shape[1]

    ia_np = a.read_ia()
    blocks = fill_row_blocks(ia_np, cfg.max_nnzs)
    cb = min(n, cfg.csrmm_cblk_size)
    entry_cap = max(1 << 14, int(cfg.hbm_budget // 6 // (cb * 4)))
    cache = ctx.pin_cache()
    idt, vdt = a.ja.dtype, a.vals.dtype
    from ..ops import device as dev
    if not dev.dtype_native_on_device(vdt):
        raise ValueError(
            f"csrmm_sharded is device compute; {vdt} would be silently "
            "narrowed on this backend — use csrmm (host block products) "
            "or enable JAX x64 on a CPU mesh")
    # narrow link dtypes for the ELL upload — both deterministic in
    # (GLOBAL panel height, config), so every process builds
    # dtype-identical shards
    ell_idt = sdev.ell_idx_dtype(k, getattr(cfg, "ell_idx_narrow", True))
    ell_vdt = sdev.ell_val_dtype(vdt, cfg)
    step = sharded_spmm_step(mesh)
    sh_rows = NamedSharding(mesh, P(axes, None))
    sh_rep = NamedSharding(mesh, P())

    accesses = []
    for r, e in blocks:
        i0, i1 = int(ia_np[r]), int(ia_np[e])
        ja_off, ja_si = a.ja.block_access(i0, i1 - i0)
        va_off, va_si = a.vals.block_access(i0, i1 - i0)
        accesses.append((a.ja.store, ja_off, ja_si))
        accesses.append((a.vals.store, va_off, va_si))

    # multi-host data plane (mirrors gemm_sharded's sharded reads): each
    # process reads only the nnz ranges of the ELL row shards its devices
    # own — contiguous ja/vals sub-reads derived from ia — instead of the
    # whole row block.  Every process computes identical ELL dimensions
    # from the host-resident ia (sdev.ell_dims), so shard shapes agree.
    from .mesh import _FORCE_SHARDED_READS
    multihost = jax.process_count() > 1
    sharded_reads = multihost or _FORCE_SHARDED_READS
    # rows_pad must divide evenly over the flattened device axis AND stay
    # sublane-friendly: lcm, not max — max(8, 6)=8 is not divisible by a
    # 6-device mesh and shard_map would reject the ELL block (only
    # power-of-two device counts divide 8)
    min_rows = int(np.lcm(8, n_dev))
    if sharded_reads:
        shard_flat: list = []
        sub_plans = []  # per block: [(s0, s1, rows_pad, rmax, shards)]
        for (r, e) in blocks:
            i0 = int(ia_np[r])
            blk_ia = ia_np[r:e + 1] - i0
            counts = np.diff(blk_ia)
            subs = []
            for (s0, s1) in sdev.ell_row_ranges(counts, entry_cap):
                rows_pad, rmax = sdev.ell_dims(counts[s0:s1], min_rows)
                idx_map = sh_rows.addressable_devices_indices_map(
                    (rows_pad, rmax))
                shards = []
                for d, slices in idx_map.items():
                    p0 = slices[0].start or 0
                    p1 = (rows_pad if slices[0].stop is None
                          else slices[0].stop)
                    lo_row = s0 + p0
                    hi_row = s0 + min(p1, s1 - s0)
                    pidx = None
                    if hi_row > lo_row:
                        nz_lo = int(blk_ia[lo_row])
                        nz_hi = int(blk_ia[hi_row])
                        if nz_hi > nz_lo:
                            pidx = len(shard_flat)
                            shard_flat.append(
                                (a.ja.store,) + a.ja.block_access(
                                    i0 + nz_lo, nz_hi - nz_lo))
                            shard_flat.append(
                                (a.vals.store,) + a.vals.block_access(
                                    i0 + nz_lo, nz_hi - nz_lo))
                    shards.append((d, p0, p1, lo_row, hi_row, pidx))
                subs.append((s0, s1, rows_pad, rmax, shards))
            sub_plans.append(subs)

    from ..core.pipeline import TicketWindow
    write_tickets = TicketWindow(depth=8)
    for c0 in range(0, n, cb):
        bc = min(cb, n - c0)
        b_host = b.read_block(0, k, c0, bc)
        b_pad = np.zeros((k, cb), b.dtype) if bc < cb else b_host
        if bc < cb:
            b_pad[:, :bc] = b_host
        b_dev = device_put_sharded(np.ascontiguousarray(b_pad), sh_rep)
        pf = PrefetchSeq(cache, shard_flat if sharded_reads else accesses,
                         depth=2 * cfg.pipeline_depth
                         * (n_dev if sharded_reads else 1))
        try:
            for bi, (r, e) in enumerate(blocks):
                i0, i1 = int(ia_np[r]), int(ia_np[e])
                rows_b = e - r
                blk_ia = ia_np[r:e + 1] - i0
                counts = np.diff(blk_ia)
                c_np = None if multihost else np.empty((rows_b, bc), vdt)
                if sharded_reads:
                    for (s0, s1, rows_pad, rmax, shards) in sub_plans[bi]:
                        ja_arrs, va_arrs, done_idx = [], [], []
                        for (d, p0, p1, lo_row, hi_row, pidx) in shards:
                            if hi_row > lo_row:
                                sub_ia = blk_ia[lo_row:hi_row + 1]
                                if pidx is not None:
                                    ja_s = pf.get(pidx).view(idt)
                                    va_s = pf.get(pidx + 1).view(vdt)
                                    done_idx += [pidx, pidx + 1]
                                else:  # real rows, all empty
                                    ja_s = np.zeros(0, idt)
                                    va_s = np.zeros(0, vdt)
                                ja_e, va_e = sdev.to_ell(
                                    sub_ia, ja_s, va_s,
                                    rmax=rmax, rows_pad=p1 - p0,
                                    idx_dtype=ell_idt, val_dtype=ell_vdt)
                            else:  # shard entirely in row padding
                                ja_e = np.zeros((p1 - p0, rmax), ell_idt)
                                va_e = np.zeros((p1 - p0, rmax), ell_vdt)
                            ja_arrs.append(jax.device_put(ja_e, d))
                            va_arrs.append(jax.device_put(va_e, d))
                        ja_g = jax.make_array_from_single_device_arrays(
                            (rows_pad, rmax), sh_rows, ja_arrs)
                        va_g = jax.make_array_from_single_device_arrays(
                            (rows_pad, rmax), sh_rows, va_arrs)
                        out = step(b_dev, ja_g, va_g)
                        for pidx in done_idx:
                            pf.done(pidx)
                        if not multihost:
                            c_np[s0:s1] = np.asarray(out)[:s1 - s0, :bc]
                            continue
                        # multihost: the global output spans devices this
                        # process cannot address — each process persists
                        # exactly the row shards its devices own (the
                        # union across processes covers the block; rows
                        # are whole storage lines, so no byte is written
                        # twice).  The per-shard write-back twin of
                        # mesh._writeback_shards.
                        for shard in out.addressable_shards:
                            p0 = shard.index[0].start or 0
                            p1 = shard.index[0].stop or rows_pad
                            lo = s0 + p0
                            hi = s0 + min(p1, s1 - s0)
                            if hi <= lo:
                                continue  # shard entirely in row padding
                            data = np.asarray(shard.data)[:hi - lo, :bc]
                            if alpha != 1.0:
                                data = data * np.dtype(vdt).type(alpha)
                            if beta != 0.0:
                                data = data + beta * c.read_block(
                                    r + lo, hi - lo, c0, bc)
                            if c.order != "R":
                                data = data.T
                            write_tickets.push(
                                c.write_block_storage_async(
                                    r + lo, c0, hi - lo, bc,
                                    np.ascontiguousarray(data)))
                else:
                    ja_blk = pf.get(2 * bi).view(idt)
                    va_blk = pf.get(2 * bi + 1).view(vdt)
                    # count-sorted ELL banding (sparse/csrmm.py, 6.4x on
                    # zipf blocks).  Single-process only: the multi-host
                    # branch above reads contiguous per-shard nnz ranges,
                    # which sorted (scattered) rows would fragment.
                    sort_rows = getattr(cfg, "ell_sort_rows", True)
                    order = (np.argsort(counts, kind="stable")
                             if sort_rows else np.arange(rows_b))
                    for (s0, s1) in sdev.ell_row_ranges(counts[order],
                                                        entry_cap):
                        rows_sel = order[s0:s1]
                        ja_ell, va_ell = sdev.to_ell_rows(
                            blk_ia, ja_blk, va_blk, rows_sel,
                            min_rows=min_rows, idx_dtype=ell_idt,
                            val_dtype=ell_vdt, counts=counts)
                        out = step(b_dev,
                                   device_put_sharded(ja_ell, sh_rows),
                                   device_put_sharded(va_ell, sh_rows))
                        c_np[rows_sel] = np.asarray(out)[:len(rows_sel),
                                                         :bc]
                    pf.done(2 * bi)
                    pf.done(2 * bi + 1)
                if multihost:
                    continue  # per-shard write-back already issued above
                c_np *= np.dtype(vdt).type(alpha)
                if beta != 0.0:
                    c_np += beta * c.read_block(r, rows_b, c0, bc)
                if c.order != "R":
                    c_np = np.ascontiguousarray(c_np.T)
                write_tickets.push(c.write_block_storage_async(
                    r, c0, rows_b, bc, np.ascontiguousarray(c_np)))
        finally:
            pf.close()
    write_tickets.wait_all()
    c.store.flush()
