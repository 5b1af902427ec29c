"""Device mesh construction and sharded GEMM steps.

New capability beyond the reference (which is strictly single-node,
SURVEY §2.6): the out-of-core superblock accumulate step scaled over a 2-D
`jax.sharding.Mesh`.  Sharding layout for C += A @ B on mesh axes
("x", "y"):

    A superblock: rows over x, K over y        P("x", "y")
    B superblock: K over y, cols replicated    P("y", None)
    C superblock: rows over x, cols over y     P("x", "y")

Each device multiplies its local (m/x, K/y) x (K/y, n) panel on the MXU
and a `psum_scatter` over y both reduces the K partial sums and scatters
the n dimension — the collective rides ICI, and C never materializes
unsharded.  The host tile pipeline feeds superblocks exactly as in the
single-chip path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("x", "y")):
    """Build a near-square 2-D mesh over the first n_devices.  If the
    default backend has too few devices (e.g. a single attached chip) but
    the host platform was configured with virtual CPU devices
    (--xla_force_host_platform_device_count), fall back to those."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n:
            devs = cpu
        else:
            raise ValueError(
                f"need {n} devices; have {len(devs)} on "
                f"{jax.default_backend()} and {len(cpu)} cpu")
    devs = devs[:n]
    px = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            px = cand
            break
    mesh_devs = np.array(devs).reshape(px, n // px)
    return Mesh(mesh_devs, axis_names)


@functools.lru_cache(maxsize=None)
def sharded_accum_step(mesh, prec: str = "highest", a_km: bool = False,
                       b_nk: bool = False, c_nm: bool = False):
    """Returns jitted step(c, a, b, alpha) with the sharding above,
    generalized over storage layouts exactly like ops/device.accum_step:
    a storage (bm,bk) or (bk,bm); b (bk,bn) or (bn,bk); c (bm,bn) or
    (bn,bm).  The m dim shards over x, K over y, and the n dim is
    psum_scattered over y — dot_general contracting dims absorb the
    transposes, so every {order}x{transA}x{transB} config runs
    multi-chip with zero data transposition.  lru_cached: a fresh
    shard_map closure per call would miss jax.jit's cache and retrace
    (30s-class remote compiles, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..ops.device import _precision

    a_spec = P("y", "x") if a_km else P("x", "y")
    b_spec = P(None, "y") if b_nk else P("y", None)
    c_spec = P("y", "x") if c_nm else P("x", "y")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(c_spec, a_spec, b_spec, P()),
        out_specs=c_spec)
    def step(c_loc, a_loc, b_loc, alpha):
        ka = 0 if a_km else 1
        kb = 1 if b_nk else 0
        if not c_nm:
            part = jax.lax.dot_general(
                a_loc, b_loc, (((ka,), (kb,)), ((), ())),
                precision=_precision(prec),
                preferred_element_type=c_loc.dtype)
            scatter_dim = 1  # n dim of the (m, n) partial
        else:
            part = jax.lax.dot_general(
                b_loc, a_loc, (((kb,), (ka,)), ((), ())),
                precision=_precision(prec),
                preferred_element_type=c_loc.dtype)
            scatter_dim = 0  # n dim of the (n, m) partial
        red = jax.lax.psum_scatter(part, "y",
                                   scatter_dimension=scatter_dim,
                                   tiled=True)
        return c_loc + alpha.astype(c_loc.dtype) * red

    return jax.jit(step, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def sharded_accum_step_q(mesh, a_km: bool = False, b_nk: bool = False,
                         c_nm: bool = False):
    """Quantized (transfer_dtype='int8') variant of sharded_accum_step:
    per-device int8 x int8 -> int32 partials reduce over the K axis with
    an EXACT int32 psum_scatter, then one f32 rescale
    (scale = alpha * scale_a * scale_b, dynamic scalar) lands in the
    fp32 accumulator — quantization rounding is the only error, exactly
    like the single-chip accum_step_q."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    a_spec = P("y", "x") if a_km else P("x", "y")
    b_spec = P(None, "y") if b_nk else P("y", None)
    c_spec = P("y", "x") if c_nm else P("x", "y")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(c_spec, a_spec, b_spec, P()),
        out_specs=c_spec)
    def step(c_loc, a_loc, b_loc, scale):
        ka = 0 if a_km else 1
        kb = 1 if b_nk else 0
        if not c_nm:
            part = jax.lax.dot_general(
                a_loc, b_loc, (((ka,), (kb,)), ((), ())),
                preferred_element_type=jnp.int32)
            scatter_dim = 1
        else:
            part = jax.lax.dot_general(
                b_loc, a_loc, (((kb,), (ka,)), ((), ())),
                preferred_element_type=jnp.int32)
            scatter_dim = 0
        red = jax.lax.psum_scatter(part, "y",
                                   scatter_dimension=scatter_dim,
                                   tiled=True)
        return c_loc + scale.astype(c_loc.dtype) * red.astype(c_loc.dtype)

    return jax.jit(step, donate_argnums=(0,))


def sharding_for(mesh, spec):
    from jax.sharding import NamedSharding
    return NamedSharding(mesh, spec)


_FORCE_SHARDED_READS = False  # test hook: exercise the multi-host read
# path on a single process (addressable devices == all devices)


def _shard_subaccess(off: int, si, shp, s0: int, s1: int, t0: int, t1: int,
                     itemsize: int):
    """Byte access covering storage lines [s0,s1) x element columns
    [t0,t1) — shard coordinates of the PADDED (sb, sb) tile — within a
    whole-tile access (off, si) whose REAL storage shape is shp.
    Returns (sub_off, sub_si | None, lines, width): lines/width are the
    real element extents (the rest of the shard is zero padding); None
    when the shard lies entirely in padding."""
    from ..io.stride import StrideInfo

    lines = max(0, min(s1, shp[0]) - s0)
    width = max(0, min(t1, shp[1]) - t0)
    if lines == 0 or width == 0:
        return off, None, 0, 0
    # a contiguous whole-tile access packs shp[0] lines of shp[1] elems
    line_stride = si.stride if si.n_strides > 1 else shp[1] * itemsize
    sub_off = off + s0 * line_stride + t0 * itemsize
    return (sub_off,
            StrideInfo(stride=line_stride, n_strides=lines,
                       len_per_stride=width * itemsize),
            lines, width)


def _shard_read_plan(specs, sharding, sb: int, itemsize: int,
                     flat_accesses: list):
    """Per-step shard plan for the multi-host producer: for every tile
    spec, one entry per addressable device — (device, shard box, real
    lines/width, index into flat_accesses or None when pure padding).
    Appends the per-shard sub-accesses to flat_accesses (consumed
    in order by a PrefetchSeq)."""
    items = list(sharding.addressable_devices_indices_map((sb, sb)).items())
    plan = []
    for (store, off, si), shp in specs:
        entries = []
        for d, slices in items:
            s0 = slices[0].start or 0
            s1 = sb if slices[0].stop is None else slices[0].stop
            t0 = slices[1].start or 0
            t1 = sb if slices[1].stop is None else slices[1].stop
            sub_off, sub_si, lines, width = _shard_subaccess(
                off, si, shp, s0, s1, t0, t1, itemsize)
            if sub_si is None:
                entries.append((d, (s0, s1, t0, t1), 0, 0, None))
            else:
                entries.append((d, (s0, s1, t0, t1), lines, width,
                                len(flat_accesses)))
                flat_accesses.append((store, sub_off, sub_si))
        plan.append(entries)
    return plan


def _assemble_shards(entries, seq, dtype, sharding, sb: int):
    """Read this process's shards (pin-cache views), zero-pad, upload
    each to its device, and assemble the global (sb, sb) array."""
    import jax

    arrs = []
    done = []
    for d, (s0, s1, t0, t1), lines, width, pidx in entries:
        shard = np.zeros((s1 - s0, t1 - t0), dtype)
        if pidx is not None:
            raw = seq.get(pidx).view(dtype)
            shard[:lines, :width] = raw.reshape(lines, width)
            done.append(pidx)
        arrs.append(jax.device_put(shard, d))
    for pidx in done:
        seq.done(pidx)
    return jax.make_array_from_single_device_arrays((sb, sb), sharding,
                                                    arrs)


def device_put_sharded(host_np, sharding):
    """Host->mesh transfer that works under multi-host SPMD: every
    process uploads ONLY the shards its local devices own and the global
    array is assembled from them (jax.make_array_from_single_device_
    arrays) — the multi-host data plane the scale-out design note
    describes (each host's tile pipeline feeds its addressable shards).
    Single-process, plain device_put is equivalent and cheaper."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(host_np, sharding)
    return _put_addressable(host_np, sharding)


def _put_addressable(host_np, sharding):
    import jax

    shards = [
        jax.device_put(host_np[idx], d)
        for d, idx in sharding.addressable_devices_indices_map(
            host_np.shape).items()
    ]
    return jax.make_array_from_single_device_arrays(
        host_np.shape, sharding, shards)


def _writeback_shards(c_dev, c, i0: int, j0: int, bi: int, bj: int,
                      sb: int):
    """Write THIS process's addressable shards of a (sb, sb)
    storage-major C superblock back to the store — the multi-host
    write-back (each host persists only the rows/cols its devices own;
    with a shared filesystem the union covers the tile).  Returns the
    write tickets.  c_dev's storage-major axes map to logical (row, col)
    directly for row-major C and swapped for column-major."""
    import jax  # noqa: F401  (shard.data materializes lazily)

    tickets = []
    for shard in c_dev.addressable_shards:
        (s0, s1) = (shard.index[0].start or 0,
                    shard.index[0].stop or sb)
        (t0, t1) = (shard.index[1].start or 0,
                    shard.index[1].stop or sb)
        if c.order == "R":
            r0, r1 = i0 + s0, min(i0 + s1, i0 + bi)
            c0_, c1 = j0 + t0, min(j0 + t1, j0 + bj)
            nr, nc = r1 - r0, c1 - c0_
            if nr <= 0 or nc <= 0:
                continue
            data = np.asarray(shard.data)[:nr, :nc]
        else:  # storage rows = logical cols for column-major C
            r0, r1 = i0 + t0, min(i0 + t1, i0 + bi)
            c0_, c1 = j0 + s0, min(j0 + s1, j0 + bj)
            nr, nc = r1 - r0, c1 - c0_
            if nr <= 0 or nc <= 0:
                continue
            data = np.asarray(shard.data)[:c1 - c0_, :r1 - r0]
        tickets.append(c.write_block_storage_async(
            r0, c0_, nr, nc, np.ascontiguousarray(data)))
    return tickets


def gemm_sharded(a, b, c, alpha: float = 1.0, beta: float = 0.0,
                 transa: str = "N", transb: str = "N",
                 blk: Optional[int] = None, mesh=None, ctx=None) -> None:
    """Multi-chip out-of-core GEMM: the single-chip 4-stage streaming
    structure of ops/gemm.py with every superblock device-sharded over the
    mesh.  A producer thread prefetches tiles through the pinned tile cache
    and issues sharded device_puts `pipeline_depth` steps ahead; the main
    thread dispatches the psum_scatter accumulate steps; a writer thread
    drains finished C superblocks to disk asynchronously — so disk I/O,
    host->HBM DMA, ICI collectives and MXU compute all overlap.  All 8
    {order}x{transA}x{transB} configs via storage-major blocks (no host or
    device transposition — shardings and contracting dims absorb it)."""
    import queue
    import threading
    import time as _time

    import jax
    from jax.sharding import PartitionSpec as P

    from ..context import get_context
    from ..core.pipeline import (PrefetchSeq, queue_put,
                             queue_put_sentinel)
    from ..ops.gemm import _op_block_reader, _storage_shape
    from ..utils import LOG, METRICS, cdiv

    ctx = ctx or c.ctx or get_context()
    cfg = ctx.config
    mesh = mesh or make_mesh()
    if c.dtype == np.float64:
        mode = getattr(cfg, "fp64_device", "auto")
        from ..ops import device as _dev
        if mode == "sliced" or (mode == "auto" and _dev.on_tpu()):
            # fp64-less backend: run the Ozaki-sliced path SPMD — int8
            # slice stacks sharded over this mesh, exact int32
            # psum_scatters on ICI (ops/gemm64.py)
            from ..ops.gemm64 import gemm64
            return gemm64(a, b, c, alpha=alpha, beta=beta, transa=transa,
                          transb=transb, blk=blk, ctx=ctx, mesh=mesh)
        if not jax.config.jax_enable_x64:
            # same guard as the single-chip dispatcher (ops/gemm.py):
            # without x64 the sharded uploads would silently narrow the
            # fp64 tiles to float32 and the writer would hand the store
            # half-width buffers
            raise ValueError(
                "float64 operands need JAX x64 mode (set JAX_ENABLE_X64=1 "
                "or jax.config.update('jax_enable_x64', True)); on TPU "
                "set fp64_device='sliced' for the exact int8-slicing path")
    px, py = mesh.devices.shape
    sb = blk or cfg.gemm_blk_size
    lcm = int(np.lcm(px, py))
    sb = max(lcm, (sb // lcm) * lcm)
    ta, tb = transa.upper() == "T", transb.upper() == "T"

    from ..core.flash_array import check_output_distinct
    check_output_distinct(c, a=a, b=b)
    m, n = c.shape
    k = a.shape[0] if ta else a.shape[1]
    if (a.shape != ((k, m) if ta else (m, k))
            or b.shape != ((n, k) if tb else (k, n))):
        raise ValueError("operand shapes inconsistent with transposes")

    # tile-major operands (core/tiled_array.py): fine on the single-host
    # path when the stored tile grid matches the (lcm-rounded) blocking;
    # the multi-host shard paths read/write sub-tile boxes, which the
    # tile-aligned access contract cannot serve
    for nm_, arr_ in (("a", a), ("b", b), ("c", c)):
        t_ = getattr(arr_, "tile", None)
        if t_ is None:
            continue
        if t_ != sb:
            raise ValueError(
                f"operand {nm_} is tile-major with tile {t_}; "
                f"gemm_sharded blk resolved to {sb} (lcm-rounded to the "
                f"{px}x{py} mesh) — repack with tile={sb}")
        import jax as _jax
        if _jax.process_count() > 1 or _FORCE_SHARDED_READS:
            raise ValueError(
                "tile-major operands are single-host only (multi-host "
                "sharded reads/writes access sub-tile boxes); unpack to "
                "a flat layout first")

    a_access, a_km = _op_block_reader(a, ta)
    b_access, b_nk = _op_block_reader(b, tb)
    c_nm = c.order == "C"
    xfer_mode = getattr(cfg, "transfer_dtype", "float32")
    if xfer_mode != "float32" and (jax.process_count() > 1
                                   or _FORCE_SHARDED_READS):
        # per-tile quantization scales need the GLOBAL tile max, which a
        # process doing shard-local reads never sees — ship fp32 there
        LOG.warning("transfer_dtype=%s ignored under multi-host sharded "
                    "reads (needs the global tile max); using float32",
                    xfer_mode)
        xfer_mode = "float32"
    if xfer_mode != "float32" and c.dtype != np.float32:
        raise ValueError(f"{xfer_mode} transfer mode needs float32 "
                         "operands")
    xfer_int8 = xfer_mode == "int8"
    if xfer_int8:
        step_q = sharded_accum_step_q(mesh, a_km=a_km, b_nk=b_nk,
                                      c_nm=c_nm)
    step = sharded_accum_step(mesh, getattr(cfg, "matmul_precision",
                                            "highest"),
                              a_km=a_km, b_nk=b_nk, c_nm=c_nm)

    def _xfer(host):
        """Quantize/round one tile for the link; returns (array, scale).
        Routed through the native prep kernels (io/native.py) — the
        single-thread numpy chain was the compressed path's dominant
        stage (5.2x measured, docs/PERFORMANCE.md) and the single-chip
        gemm already uses them."""
        if xfer_mode == "bfloat16":
            from ..io.native import cast_bf16
            return cast_bf16(host), None
        if xfer_int8:
            from ..io.native import quantize_i8
            return quantize_i8(host)
        return host, None
    sh_a = sharding_for(mesh, P("y", "x") if a_km else P("x", "y"))
    sh_b = sharding_for(mesh, P(None, "y") if b_nk else P("y", None))
    sh_c = sharding_for(mesh, P("y", "x") if c_nm else P("x", "y"))

    def pad(mat, shape):
        if mat.shape == shape:
            return mat
        out = np.zeros(shape, mat.dtype)
        out[:mat.shape[0], :mat.shape[1]] = mat
        return out

    mB, nB, kB = cdiv(m, sb), cdiv(n, sb), cdiv(k, sb)
    steps = [(i, j, l) for j in range(nB) for i in range(mB)
             for l in range(kB)]

    def tile_dims(i, j, l):
        return min(sb, m - i * sb), min(sb, n - j * sb), min(sb, k - l * sb)

    a_specs, b_specs = [], []
    for (i, j, l) in steps:
        bi, bj, bl = tile_dims(i, j, l)
        (off, si), shp = a_access(i * sb, l * sb, bi, bl)
        a_specs.append(((a.store, off, si), shp))
        (off, si), shp = b_access(l * sb, j * sb, bl, bj)
        b_specs.append(((b.store, off, si), shp))

    # clamp the prefetch lookahead to the pin-cache budget: the TWO
    # PrefetchSeqs below pin 2*depth tiles up front, the backlog services
    # strictly FIFO, and wait_ready has no timeout — a budget smaller
    # than the pinned window plus the backlog head would LIVELOCK (seq_a's
    # pins fill real_size, seq_b's head never allocates).  2*depth + 2
    # tiles must fit; too small for even depth=1 is a loud error.
    tile_bytes = sb * sb * np.dtype(a.dtype).itemsize
    budget = getattr(ctx.config, "program_budget", 8 << 30)
    if budget < 4 * tile_bytes:
        raise MemoryError(
            f"program_budget {budget} cannot hold the 4 superblocks "
            f"({4 * tile_bytes} B at blk={sb}) the sharded pipeline "
            "needs in flight; reduce blk or raise the budget")
    depth = max(1, min(cfg.pipeline_depth,
                       int((budget - 2 * tile_bytes) // (2 * tile_bytes))))
    cache = ctx.pin_cache()
    tile_q: queue.Queue = queue.Queue(maxsize=depth)
    write_q: queue.Queue = queue.Queue(maxsize=max(2, depth))
    errors: list = []
    alpha_s = np.dtype(c.dtype).type(alpha)
    beta_s = np.dtype(c.dtype).type(beta)

    # device-side B-tile LRU: with steps ordered j-outer/i-middle/l-inner
    # the B superblock (l, j) recurs for every i — the host pin cache
    # dedups the disk read but not the upload.  Keep up to `b_cap` sharded
    # B tiles resident in HBM (the multi-chip analog of the single-chip
    # gemm's HBM tile LRU) so only the first i-sweep pays the H2D.
    from ..io.store import store_uid
    # sh_b shards B over the 'y' axis ONLY (replicated across 'x'), so
    # per-device footprint divides by py, not px*py
    per_dev_tile = sb * sb * np.dtype(b.dtype).itemsize // max(py, 1)
    b_cap = max(1, min(kB, int(cfg.hbm_budget // 3 // max(per_dev_tile, 1))))

    # multi-host data plane: each process READS only the byte ranges its
    # devices own (per-shard StrideInfo sub-accesses through the pin
    # cache) and uploads them — no H-fold read amplification on a shared
    # filesystem.  Single-process keeps whole-tile reads (one access per
    # tile beats n_dev strided sub-reads when every shard is local).
    sharded_reads = jax.process_count() > 1 or _FORCE_SHARDED_READS
    itemsize = np.dtype(a.dtype).itemsize
    if sharded_reads:
        a_flat: list = []
        b_flat: list = []
        a_plan = _shard_read_plan(a_specs, sh_a, sb, itemsize, a_flat)
        b_plan = _shard_read_plan(b_specs, sh_b, sb, itemsize, b_flat)
        shards_per_tile = max(1, len(a_plan[0]) if a_plan else 1)

    def producer():
        seq_a = seq_b = None
        b_lru: dict = {}  # spec key -> sharded device array (insert-ordered)
        try:
            # inside the try: PrefetchSeq pins `depth` tiles immediately,
            # and a pin failure (over-budget tile, I/O error) must land in
            # `errors` or the main loop would wait forever
            if sharded_reads:
                seq_a = PrefetchSeq(cache, a_flat,
                                    depth * shards_per_tile)
                seq_b = PrefetchSeq(cache, b_flat,
                                    depth * shards_per_tile)
            else:
                seq_a = PrefetchSeq(cache, [s for s, _ in a_specs], depth)
                seq_b = PrefetchSeq(cache, [s for s, _ in b_specs], depth)
            for idx, (i, j, l) in enumerate(steps):
                bi, bj, bl = tile_dims(i, j, l)
                c_init = None
                if l == 0 and beta != 0.0:
                    c_host = c.read_block_storage(i * sb, bi, j * sb, bj)
                    c_init = device_put_sharded(
                        beta_s * pad(c_host, (sb, sb)), sh_c)
                t0 = _time.perf_counter()
                (b_store, b_off, b_si), b_shp = b_specs[idx]
                b_key = (store_uid(b_store), b_off, b_si)
                b_dev = b_lru.pop(b_key, None)  # pop+reinsert = LRU touch
                b_uploaded = b_dev is None
                if sharded_reads:
                    a_dev = _assemble_shards(a_plan[idx], seq_a, a.dtype,
                                             sh_a, sb)
                    if b_dev is None:
                        b_dev = _assemble_shards(b_plan[idx], seq_b,
                                                 b.dtype, sh_b, sb)
                    else:
                        METRICS.add("gemm_sharded.b_hbm_hits")
                        for *_rest, pidx in b_plan[idx]:
                            if pidx is not None:  # keep the seq in order
                                seq_b.get(pidx)
                                seq_b.done(pidx)
                    t1 = t2 = _time.perf_counter()
                else:
                    a_host = seq_a.get(idx).view(a.dtype).reshape(
                        a_specs[idx][1])
                    if b_dev is None:
                        b_host = seq_b.get(idx).view(b.dtype).reshape(b_shp)
                    else:
                        seq_b.get(idx)  # keep the prefetch seq in lockstep
                        b_host = None
                        METRICS.add("gemm_sharded.b_hbm_hits")
                    a_host, sa = _xfer(a_host)
                    t1 = _time.perf_counter()
                    a_up = device_put_sharded(pad(a_host, (sb, sb)), sh_a)
                    a_dev = (a_up, sa) if xfer_int8 else a_up
                    if b_dev is None:
                        b_host, sb_s = _xfer(b_host)
                        b_up = device_put_sharded(pad(b_host, (sb, sb)),
                                                  sh_b)
                        b_dev = (b_up, sb_s) if xfer_int8 else b_up
                    t2 = _time.perf_counter()
                    seq_a.done(idx)
                    seq_b.done(idx)
                b_lru[b_key] = b_dev
                while len(b_lru) > b_cap:
                    b_lru.pop(next(iter(b_lru)))
                METRICS.add("gemm_sharded.disk_wait_s", t1 - t0)
                METRICS.add("gemm_sharded.h2d_s", t2 - t1)
                x_isize = {"bfloat16": 2, "int8": 1}.get(xfer_mode,
                                                         itemsize)
                METRICS.add("gemm_sharded.h2d_bytes",
                            sb * sb * (x_isize + (x_isize if b_uploaded
                                                  else 0)))
                if not queue_put(tile_q, (a_dev, b_dev, c_init),
                                 errors):
                    return
        except BaseException as e:  # pragma: no cover
            errors.append(e)
            try:
                tile_q.put_nowait(None)
            except queue.Full:
                pass
        finally:
            if seq_a is not None:
                seq_a.close()
            if seq_b is not None:
                seq_b.close()

    def writer():
        try:
            import jax as _jax

            from ..core.pipeline import TicketWindow
            multihost = _jax.process_count() > 1
            tickets = TicketWindow(depth=8)
            while True:
                try:  # timeout-get + errors check: queue_put_sentinel's
                    # contract is that consumers key shutdown off the
                    # shared error list (a full queue can drop the None)
                    item = write_q.get(timeout=1.0)
                except queue.Empty:
                    if errors:
                        break
                    continue
                if item is None:
                    break
                i, j, bi, bj, c_dev = item
                t0 = _time.perf_counter()
                w0 = tickets.wait_s
                if multihost:
                    # each process persists only its addressable shards
                    # (np.asarray of a multi-host global array would fail)
                    tickets.extend(_writeback_shards(
                        c_dev, c, i * sb, j * sb, bi, bj, sb))
                else:
                    ci = _storage_shape(c, (bi, bj))
                    c_host = np.asarray(c_dev)[:ci[0], :ci[1]]
                    tickets.push(c.write_block_storage_async(
                        i * sb, j * sb, bi, bj, c_host))
                # push() may stall on the window's oldest disk write —
                # book that as write wait, not device download time
                METRICS.add("gemm_sharded.d2h_s",
                            _time.perf_counter() - t0
                            - (tickets.wait_s - w0))
            tickets.wait_all()
            METRICS.add("gemm_sharded.write_wait_s", tickets.wait_s)
        except BaseException as e:  # pragma: no cover
            errors.append(e)

    prod_t = threading.Thread(target=producer, daemon=True)
    writ_t = threading.Thread(target=writer, daemon=True)
    m_before = METRICS.snapshot()
    prod_t.start()
    writ_t.start()

    t_start = _time.perf_counter()
    c_dev = None
    for idx, (i, j, l) in enumerate(steps):
        item = None
        while True:
            try:
                item = tile_q.get(timeout=1.0)
                break
            except queue.Empty:
                if errors:
                    break
        if item is None:
            break
        a_dev, b_dev, c_init = item
        bi, bj, bl = tile_dims(i, j, l)
        if l == 0:
            c_dev = (c_init if c_init is not None
                     else device_put_sharded(np.zeros((sb, sb), c.dtype),
                                             sh_c))
        if xfer_int8:
            a_q, sa = a_dev
            b_q, sb_s = b_dev
            c_dev = step_q(c_dev, a_q, b_q, np.float32(alpha * sa * sb_s))
        else:
            c_dev = step(c_dev, a_dev, b_dev, alpha_s)
        if l == kB - 1:
            queue_put(write_q, (i, j, bi, bj, c_dev), errors)
        if errors:
            break
    queue_put_sentinel(write_q, errors)
    while prod_t.is_alive():
        prod_t.join(timeout=1.0)
        if errors:
            prod_t.join(timeout=30)
            break
    while writ_t.is_alive():
        writ_t.join(timeout=1.0)
        if errors:
            writ_t.join(timeout=30)
            break
    if errors:
        raise errors[0]
    c.store.flush()
    wall = _time.perf_counter() - t_start
    m_after = METRICS.snapshot()
    busy = sum(m_after.get(k, 0.0) - m_before.get(k, 0.0)
               for k in ("gemm_sharded.disk_wait_s", "gemm_sharded.h2d_s",
                         "gemm_sharded.d2h_s"))
    LOG.info("gemm_sharded %dx%dx%d on %dx%d mesh: %.2fs wall, "
             "%.2fs producer+writer stage time (overlap factor %.2f)",
             m, n, k, px, py, wall, busy, busy / wall if wall else 0.0)
