"""Out-of-core FP64 GEMM on accelerators without fp64 units.

The reference supports FP_DOUBLE_PRECISION throughout — `FPTYPE=double`
maps every kernel to `cblas_d*` (reference: include/bof_types.h:24-42) and
flash::gemm runs the same task DAG over double operands (reference:
src/blas/gemm.cpp:27-202).  TPU v5e has no fp64 hardware, so a literal
port is impossible; this module closes the gap the TPU-native way:
**Ozaki-style error-free mantissa slicing** onto the int8 MXU.

Scheme (per output superblock, K streamed like ops/gemm.py):

1. One disk-only pre-pass computes per-row amax of op(A) and per-column
   amax of op(B); sigma/tau are the next powers of two, so r = x/sigma is
   an EXACT fp64 operation with |r| < 1.
2. Each tile splits into `s` int8 slices by repeated round-and-subtract
   (Q0 = rint(r*2^6), r <- r*2^6 - Q0, then 2^7 steps): every step is an
   error-free transformation, so  x/sigma = sum_i Q_i 2^(-6-7i)  up to a
   2^(-7s) truncation (s=8 covers the full 53-bit mantissa).
3. The device multiplies slice pairs int8 x int8 -> int32 on the MXU —
   EXACT products — grouping pairs by total weight p = i+j into int32
   accumulator planes S_p that also accumulate across the K loop
   (36 MXU products per superblock step at s=8).
4. Planes flush to the host before int32 overflow could occur
   (k_flush = 2^18/s rows, 2x margin under the 2^31 bound) and fold into
   a float64 accumulator:  C += sigma x tau * sum_p S_p 2^(-12-7p).

Result: fp64 out-of-core GEMM whose only inexactness is the 2^(-7s)
slice truncation relative to the per-row/column scale plus one fp64
rounding per flush — comparable to (and for uniform-magnitude data
tighter than) a native fp64 accumulation of k terms.  All eight
{order}x{transa}x{transb} layouts are supported through the same
storage-major contracting-dims scheme as ops/device.py; no jax x64 mode
is needed (the device only ever sees int8/int32).

Capacity model: ~s(s+1)/2 int8 MXU products' worth of MACs per fp64
superblock product, packed into s anti-diagonal dot_generals (see
_slice_accum).  On v5e (394 int8 TOPS) at s=8 the model gives ~11
effective fp64 TFLOP/s; measured 6.72 TF/s device-resident
(tools/fp64_bench.py, docs/PERFORMANCE.md) — far above any host CPU's
fp64 GEMM — while A/B tiles cross the link at 8 bytes/element (s int8
slices), exactly fp64 width.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np

from ..context import get_context
from ..utils import LOG, METRICS, Timer, cdiv
from . import device as dev


def _pow2_scale(amax: np.ndarray) -> np.ndarray:
    """Smallest power of two STRICTLY above each amax (frexp exponent:
    amax = m*2^e with m in [0.5, 1), so 2^e > amax); amax == 0 -> 1.0.
    Division by the result is exact and yields |r| < 1."""
    return np.ldexp(1.0, np.frexp(amax)[1])


def _split_slices(tile: np.ndarray, exps: np.ndarray, s: int) -> np.ndarray:
    """Error-free split: tile*2^-exps = sum_i out[i]*2^(-6-7i) + O(2^(-7s)).

    Every step is exact fp64 arithmetic (power-of-two multiplies; the
    subtraction of rint(t) from t cancels the high bits Sterbenz-style),
    so the slices reproduce the top 6+7(s-1) mantissa bits of each element
    relative to its row/column scale.  |out[i]| <= 64 fits int8 with the
    MXU's exact-int8-product range to spare.  `exps` is the broadcastable
    integer frexp-exponent array of the scales — scaling via ldexp instead
    of dividing by 2^exps stays exact even when 2^exps itself would
    overflow fp64 (exps = 1024 for amax near DBL_MAX), matching the native
    engine's bof_split_f64_i8."""
    r = np.ldexp(tile.astype(np.float64), -exps)
    out = np.empty((s,) + tile.shape, np.int8)
    mult = 64.0  # first slice takes 6 bits (|r| < 1 -> |rint(64r)| <= 64)
    for i in range(s):
        t = r * mult
        q = np.rint(t)
        out[i] = q.astype(np.int8)
        r = t - q  # exact; |r| <= 0.5 afterwards
        mult = 128.0
    return out


@functools.partial(jax.jit, static_argnames=("a_km", "b_nk", "c_nm"),
                   donate_argnums=(0,))
def _slice_accum(S, a_sl, b_sl, *, a_km: bool, b_nk: bool, c_nm: bool):
    """S[p] += sum_{i+j=p} op(A_i) op(B_j) as exact int8->int32 MXU
    products, storage-major layouts absorbed by contracting dims exactly
    like ops/device.py accum_step (the fp64 analog of accum_step_q).

    Each weight plane is ONE dot_general: the anti-diagonal i+j=p pairs
    a_sl[0..p] with b_sl[p..0], so contracting the plane-index dim AND
    the k dim together computes the whole diagonal sum inside the MXU's
    int32 accumulator.  vs the naive s(s+1)/2 separate products this
    runs the same MACs in s dots and replaces the s(s+1)/2 HBM-bound
    (sb, sb) int32 plane adds with s — integer arithmetic, so the planes
    are BIT-identical to the pairwise form (the k_flush overflow bound
    |S_p| <= s*k_acc*2^12 is unchanged: same summands, same plane)."""
    import jax.numpy as jnp
    from jax import lax
    s = a_sl.shape[0]
    ka = 0 if a_km else 1
    kb = 1 if b_nk else 0
    b_rev = jnp.flip(b_sl, 0)  # b_rev[t] = b_sl[s-1-t]
    outs = []
    for p in range(S.shape[0]):
        a_d = a_sl[:p + 1]          # planes i = 0..p
        b_d = b_rev[s - 1 - p:]     # planes j = p..0 (aligned: i + j = p)
        if not c_nm:
            o = lax.dot_general(a_d, b_d,
                                (((0, ka + 1), (0, kb + 1)), ((), ())),
                                preferred_element_type=jnp.int32)
        else:
            o = lax.dot_general(b_d, a_d,
                                (((0, kb + 1), (0, ka + 1)), ((), ())),
                                preferred_element_type=jnp.int32)
        outs.append(S[p] + o)
    return jnp.stack(outs)


@functools.lru_cache(maxsize=None)
def _sharded_slice_accum(mesh, s: int, a_km: bool, b_nk: bool,
                         c_nm: bool):
    """Mesh variant of _slice_accum (the fp64 analog of
    parallel/mesh.py sharded_accum_step_q): each int8 slice stack shards
    A's m dim over 'x' and the K dim over 'y'; every int32 plane's
    partial products psum_scatter their n dim over 'y' — the collective
    is an EXACT int32 sum riding ICI, so distribution changes nothing
    about the error-free accumulation (the k_flush overflow guard bounds
    the summed K rows identically).  lru_cached per (mesh, s, layouts):
    a fresh shard_map closure would miss jax.jit's cache and retrace."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    a_spec = P(None, "y", "x") if a_km else P(None, "x", "y")
    b_spec = P(None, None, "y") if b_nk else P(None, "y", None)
    c_spec = P(None, "y", "x") if c_nm else P(None, "x", "y")

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(c_spec, a_spec, b_spec),
                       out_specs=c_spec)
    def step(S_loc, a_loc, b_loc):
        from jax import lax
        ka = 0 if a_km else 1
        kb = 1 if b_nk else 0
        # anti-diagonal contraction (see _slice_accum): one dot + one
        # psum_scatter per weight plane instead of p+1 of each —
        # bit-identical int32 (the ICI reduction is an exact integer sum)
        b_rev = jnp.flip(b_loc, 0)
        outs = []
        for p in range(S_loc.shape[0]):
            a_d = a_loc[:p + 1]
            b_d = b_rev[s - 1 - p:]
            if not c_nm:
                o = lax.dot_general(a_d, b_d,
                                    (((0, ka + 1), (0, kb + 1)), ((), ())),
                                    preferred_element_type=jnp.int32)
                sd = 1  # n dim of the (m, n) partial
            else:
                o = lax.dot_general(b_d, a_d,
                                    (((0, kb + 1), (0, ka + 1)), ((), ())),
                                    preferred_element_type=jnp.int32)
                sd = 0  # n dim of the (n, m) partial
            red = lax.psum_scatter(o, "y", scatter_dimension=sd,
                                   tiled=True)
            outs.append(S_loc[p] + red)
        return jnp.stack(outs)

    return jax.jit(step, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def _renorm_digits(s: int):
    """jitted exact base-2^7 redigitization of the weight planes.

    The s int32 planes are a redundant signed-digit representation of
    sum_p S_p 2^(-7p): consecutive planes overlap in 32-7=25 bits, so
    downloading them all costs 4s bytes per C element while the value
    they encode needs far fewer.  One carry sweep from the lowest weight
    upward — carry = (S_p + 64) >> 7 (arithmetic shift: round-to-
    nearest, ties down), d_p = S_p - (carry << 7) in [-64, 63],
    S_{p-1} += carry — yields int8 digit planes plus an int32 head with
    IDENTICAL value (integer identity S_p = 128*carry + d_p, no
    rounding anywhere).  D2H drops 4s -> 4 + (s-1) bytes per element
    (32 -> 11 at s=8) on the h2d/d2h-bound out-of-core path.  Overflow-
    safe under the k_flush bound: |S_p| <= 2^30, |carry| <= 2^23, so
    |S_{p-1} + carry| < 2^31.  No reference analog — the reference's
    fp64 path is native dgemm (include/bof_types.h:24-42); this is
    TPU-emulation plumbing."""
    import jax
    import jax.numpy as jnp

    def renorm(S):
        digits = []
        cur = S[s - 1]
        for p in range(s - 1, 0, -1):
            carry = (cur + 64) >> 7
            digits.append((cur - (carry << 7)).astype(jnp.int8))
            cur = S[p - 1] + carry
        return cur, jnp.stack(digits[::-1])

    return jax.jit(renorm)


@functools.lru_cache(maxsize=None)
def _sharded_zeros(mesh, spec, shape):
    """jitted sharded-zeros initializer (no host upload: XLA materializes
    each shard on its own device)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    return jax.jit(lambda: jnp.zeros(shape, jnp.int32),
                   out_shardings=NamedSharding(mesh, spec))


def _axis_amax(arr, access_fn, outer_blocks: int, inner_blocks: int,
               sb: int, outer_len: int, inner_len: int, reduce_axis: int,
               cache, debug: bool = False) -> np.ndarray:
    """Disk-only pre-pass: per-outer-index abs max over the inner (K)
    axis.  One extra read of the operand through the pin cache (host
    bytes, no device link traffic); fixing sigma per GLOBAL row lets the
    int32 planes accumulate across the whole K loop."""
    amax = np.zeros(outer_len, np.float64)
    for o in range(outer_blocks):
        bo = min(sb, outer_len - o * sb)
        for q in range(inner_blocks):
            bq = min(sb, inner_len - q * sb)
            (off, sinfo), st_shape = access_fn(o * sb, q * sb, bo, bq)
            pin = cache.pin_read(arr.store, off, sinfo)
            try:
                cache.wait_ready(pin)
                t = cache.buf(pin).view(arr.dtype).reshape(st_shape)
                # tile-major storage returns the full zero-padded tile
                # (core/tiled_array.py _block_shape_storage); slice to
                # the logical region so v matches the amax window length
                lr, lc = (bo, bq) if reduce_axis == 1 else (bq, bo)
                t = t[:lr, :lc]
                if debug:
                    # inf/nan silently corrupts the EFT split (reference
                    # DEBUG builds validate kernel inputs the same way,
                    # blas_utils.h:100-141)
                    if not np.isfinite(t).all():
                        raise ValueError(
                            "gemm64: non-finite value in operand block "
                            f"({o * sb},{q * sb}) — the sliced fp64 path "
                            "requires finite inputs")
                v = np.abs(t).max(axis=reduce_axis)
            finally:
                # unpin on EVERY path: a leaked pin would wedge the tile
                # as pinned+poisoned forever (ops/gemm.py get_dev has the
                # same guard) — and the debug ValueError above raises
                # mid-pin deterministically
                cache.unpin(pin)
            np.maximum(amax[o * sb:o * sb + bo], v,
                       out=amax[o * sb:o * sb + bo])
    return amax


def gemm64(a, b, c, alpha: float = 1.0, beta: float = 0.0,
           transa: str = "N", transb: str = "N",
           blk: Optional[int] = None, ctx=None,
           slices: Optional[int] = None,
           k_flush: Optional[int] = None, mesh=None) -> None:
    """C = alpha*op(A)op(B) + beta*C for float64 flash arrays via exact
    int8 slicing (module docstring).  Shapes/layouts as ops/gemm.gemm,
    which dispatches here for float64 operands when
    `FlashConfig.fp64_device` resolves to "sliced" (default on TPU).

    `slices`/`k_flush` override `fp64_slices` and the overflow-safe flush
    interval (tests use small values to exercise multi-flush runs).

    `mesh` shards every slice stack and int32 plane over the device mesh
    (gemm_sharded routes float64 here on fp64-less backends): the MXU
    products run SPMD with exact int32 psum_scatters over ICI.  Under
    `jax.process_count() > 1` each process folds only the int32 plane
    shards its devices own and writes back only those regions of C (the
    union over processes covers each tile exactly once, mirroring
    parallel/mesh._writeback_shards); operand reads stay full-tile per
    process (host bytes from the shared filesystem, no device cost)."""
    from ..io.store import store_uid
    from .gemm import HbmCache, _op_block_reader

    ctx = ctx or c.ctx or get_context()
    cfg = ctx.config
    sb = blk or cfg.gemm_blk_size
    multihost = False
    if mesh is not None:
        import jax
        multihost = jax.process_count() > 1
        px, py = mesh.devices.shape
        lcm = int(np.lcm(px, py))
        sb = max(lcm, (sb // lcm) * lcm)
    s = int(slices or getattr(cfg, "fp64_slices", 8))
    if not 2 <= s <= 12:
        raise ValueError(f"fp64_slices must be in [2, 12], got {s}")
    # int32 overflow guard: |S_p| <= s * k_acc * 2^12 must stay < 2^31
    k_flush = int(k_flush or ((1 << 18) // s))
    ta, tb = transa.upper() == "T", transb.upper() == "T"

    from ..core.tiled_array import check_tile_blk
    check_tile_blk((("a", a), ("b", b), ("c", c)), sb)
    if multihost and getattr(c, "tile", None) is not None:
        raise ValueError(
            "gemm64: tile-major C is single-process only under a mesh "
            "(per-shard region write-back needs flat storage; repack C "
            "or use a flat map_array output)")

    from ..core.flash_array import check_output_distinct
    check_output_distinct(c, a=a, b=b)
    m, n = c.shape
    k = a.shape[0] if ta else a.shape[1]
    mB, nB, kB = cdiv(m, sb), cdiv(n, sb), cdiv(k, sb)
    a_access, a_km = _op_block_reader(a, ta)
    b_access, b_nk = _op_block_reader(b, tb)
    c_nm = c.order == "C"
    c_tiled = getattr(c, "tile", None) is not None

    cache = ctx.pin_cache()
    hbm = HbmCache(max(cfg.hbm_budget // 2, 8 * (s * sb * sb)))

    # single-chip vs mesh execution hooks: how a padded stack reaches the
    # device, how a plane set accumulates one step, how fresh S planes
    # materialize.  The rest of the kernel (pre-pass, producer pipeline,
    # group schedule, flush/fold, write-back) is identical either way.
    import jax.numpy as jnp
    if mesh is None:
        put = {"a": dev.to_device, "b": dev.to_device}

        def accum(S, a_sl, b_sl):
            return _slice_accum(S, a_sl, b_sl, a_km=a_km, b_nk=b_nk,
                                c_nm=c_nm)

        def new_S():
            return jnp.zeros((s, sb, sb), jnp.int32)
    else:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import device_put_sharded, sharding_for

        a_sh = sharding_for(mesh, P(None, "y", "x") if a_km
                            else P(None, "x", "y"))
        b_sh = sharding_for(mesh, P(None, None, "y") if b_nk
                            else P(None, "y", None))
        put = {"a": lambda x: device_put_sharded(x, a_sh),
               "b": lambda x: device_put_sharded(x, b_sh)}
        accum = _sharded_slice_accum(mesh, s, a_km, b_nk, c_nm)
        new_S = _sharded_zeros(
            mesh, P(None, "y", "x") if c_nm else P(None, "x", "y"),
            (s, sb, sb))

    timer = Timer()
    # per-row / per-column power-of-two scales (disk-only pre-pass)
    amax_m = _axis_amax(a, a_access, mB, kB, sb, m, k,
                        0 if a_km else 1, cache, debug=cfg.debug_checks)
    amax_n = _axis_amax(
        b, lambda o, q, bo, bq: b_access(q, o, bq, bo),
        nB, kB, sb, n, k, 1 if b_nk else 0, cache,
        debug=cfg.debug_checks)
    exp_m = np.frexp(amax_m)[1].astype(np.int32)
    exp_n = np.frexp(amax_n)[1].astype(np.int32)
    w = np.ldexp(1.0, -12 - 7 * np.arange(s))  # pair-plane weights

    def dev_slices(role, arr, access_fn, o0, q0, bo, bq, evec, per_line):
        """Split + upload one operand tile as an (s, sb, sb) int8 stack,
        LRU-cached in HBM (re-sweeps reuse the upload, ops/gemm.py).
        The split runs in the native engine's fused parallel pass when
        available (io/native.py split_f64_i8), numpy chain otherwise —
        bit-identical either way (both are exact EFT sequences).

        `role` ('a'/'b') is part of the cache key: unlike the fp32 path,
        the cached object is NOT the raw tile — it is split with the
        operand's row/column scales, so when A and B alias the same store
        the two roles must never share an entry (A uses per-row sigma, B
        per-column tau)."""
        (off, sinfo), st_shape = access_fn(o0, q0, bo, bq)
        key = (role, store_uid(arr.store), off, sinfo)
        hit = hbm.get(key)
        if hit is not None:
            return hit
        pin = cache.pin_read(arr.store, off, sinfo)
        try:
            cache.wait_ready(pin)
            t = cache.buf(pin).view(arr.dtype).reshape(st_shape)
            # tile-major storage hands back the full zero-padded tile;
            # the scale vector covers only the logical extent, so slice
            # first (the zero padding is re-applied below at the stack
            # level)
            lr, lc = (bo, bq) if per_line else (bq, bo)
            t = t[:lr, :lc]
            from ..io.native import split_f64_i8
            q8 = split_f64_i8(t, evec, per_line, s)
            if q8 is None:  # engine unavailable: numpy EFT chain
                exps_2d = (evec[:, None] if per_line else evec[None, :])
                q8 = _split_slices(t, exps_2d, s)
        finally:
            # every path: a leaked pin wedges the tile pinned+poisoned
            cache.unpin(pin)
        pad = np.zeros((s, sb, sb), np.int8)
        pad[:, :q8.shape[1], :q8.shape[2]] = q8
        d = put[role](pad)
        METRICS.add("gemm64.h2d_bytes", pad.nbytes)
        return hbm.put(key, d, pad.nbytes)

    # under multihost each process can only materialize its ADDRESSABLE
    # plane shards; it folds them at their (storage-major) coordinates and
    # later writes back exactly those regions of C.  The regions are a
    # property of the static sharding — recorded once on first flush.
    owned_regions: list = []

    def _fold(planes, block):
        """block += sum_p w[p]*planes[p]: native fused pass (one sweep,
        prep_parallel fan-out, bit-identical per-element fp64 sequence)
        with the numpy multiply-add chain as fallback."""
        from ..io.native import fold_i32_f64
        if not fold_i32_f64(planes, w, block):
            for p in range(planes.shape[0]):
                block += w[p] * planes[p]  # int32 * f64: exact products

    import os
    # exact digit renorm before D2H (single-chip path; the mesh branch
    # below moves plane shards host-intra, where 4s bytes don't ride the
    # accelerator link).  Kill-switch mirrors BOF_NO_SPAN_COALESCE.
    digit_d2h = mesh is None and not os.environ.get("BOF_NO_PLANE_DIGITS")

    def flush(S, c_acc):
        if not multihost:
            if digit_d2h:
                head, digs = _renorm_digits(s)(S)
                head = dev.from_device(head)     # (sb, sb) int32
                digs = dev.from_device(digs)     # (s-1, sb, sb) int8
                METRICS.add("gemm64.d2h_bytes", head.nbytes + digs.nbytes)
                # same value, same weights: head takes w[0], digit plane
                # p-1 takes w[p]; widening to int32 reuses the fused fold
                planes = np.concatenate(
                    [head[None], digs.astype(np.int32)])
            else:
                planes = dev.from_device(S)  # (s, sb, sb) int32, exact
                METRICS.add("gemm64.d2h_bytes", planes.nbytes)
            _fold(planes, c_acc)
            return c_acc
        record = not owned_regions
        for shard in S.addressable_shards:
            _, xs, ys = shard.index
            planes = np.asarray(shard.data)  # (s, lx, ly) int32
            METRICS.add("gemm64.d2h_bytes", planes.nbytes)
            x0, y0 = xs.start or 0, ys.start or 0
            block = c_acc[x0:x0 + planes.shape[1],
                          y0:y0 + planes.shape[2]]
            _fold(planes, block)
            if record:
                owned_regions.append(((x0, x0 + planes.shape[1]),
                                      (y0, y0 + planes.shape[2])))
        return c_acc

    import queue
    import threading

    from ..core.pipeline import TicketWindow, queue_put

    # HBM-aware group schedule (the fp32 path's, ops/gemm.py:177-197,
    # adapted to slice stacks): partition the j space into groups whose
    # B stack panel (G * kB stacks) plus G live int32 accumulator planes
    # fits the budget, then sweep  jg -> i -> l -> j∈jg.  Within a group
    # every B stack crosses the link once and each A(i, l) stack is read,
    # EFT-split and uploaded once per group sweep instead of once per j —
    # total link traffic ≈ |B| + |A| * n_groups.
    stack_bytes = s * sb * sb          # one int8 slice stack
    acc_bytes = 4 * stack_bytes        # one live (s, sb, sb) int32 S
    spare = max(hbm.budget - 4 * stack_bytes, stack_bytes)
    G = int(max(1, min(nB, spare // (kB * stack_bytes + acc_bytes
                                     + stack_bytes))))
    groups = [list(range(g, min(g + G, nB))) for g in range(0, nB, G)]
    steps = [(i, j, l) for jg in groups for i in range(mB)
             for l in range(kB) for j in jg]
    tile_q: queue.Queue = queue.Queue(maxsize=2)
    errors: list = []

    def producer():
        """Pins + splits + uploads slice stacks ahead of the dispatch
        loop (the fp32 pipeline's producer stage, ops/gemm.py): on a real
        host the fused EFT split is the sliced path's dominant host term,
        so it must overlap the MXU products and the int32-plane flushes.
        jax dispatch is already async — the queue only needs depth 2."""
        try:
            for (i, j, l) in steps:
                bi = min(sb, m - i * sb)
                bj = min(sb, n - j * sb)
                bl = min(sb, k - l * sb)
                a_sl = dev_slices("a", a, a_access, i * sb, l * sb, bi, bl,
                                  exp_m[i * sb:i * sb + bi],
                                  per_line=not a_km)
                b_sl = dev_slices(
                    "b", b, lambda o, q, bo, bq: b_access(q, o, bq, bo),
                    j * sb, l * sb, bj, bl,
                    exp_n[j * sb:j * sb + bj], per_line=b_nk)
                # shared shutdown protocol (core/pipeline.queue_put)
                if not queue_put(tile_q, (a_sl, b_sl), errors):
                    return
        except BaseException as e:  # pragma: no cover
            errors.append(e)
            try:
                tile_q.put_nowait(None)
            except queue.Full:
                pass

    prod_t = threading.Thread(target=producer, daemon=True)
    prod_t.start()

    def next_tiles():
        while True:
            try:
                item = tile_q.get(timeout=1.0)
            except queue.Empty:
                if errors:
                    return None
                continue
            return item

    # bounded in-flight write tickets: each Ticket holds its source
    # buffer (sb*sb*8 B of fp64) until wait(), so accumulating all of
    # them to end-of-kernel would grow host RAM to the full padded |C| —
    # the exact out-of-core regime this kernel exists for.  8 in flight
    # keeps the disk writer busy while bounding the buffers.
    tickets = TicketWindow(depth=8)

    try:
        for jg in groups:
            for i in range(mB):
                bi = min(sb, m - i * sb)
                em_blk = exp_m[i * sb:i * sb + bi]
                S = {j: new_S() for j in jg}
                c_acc = {j: np.zeros((sb, sb), np.float64) for j in jg}
                k_acc = 0  # shared: every j in the group sees the same l
                for l in range(kB):
                    bl = min(sb, k - l * sb)
                    if k_acc and k_acc + bl > k_flush:
                        for j in jg:
                            c_acc[j] = flush(S[j], c_acc[j])
                            S[j] = new_S()
                        k_acc = 0
                    for j in jg:
                        item = next_tiles()
                        if item is None:
                            raise errors[0]
                        a_sl, b_sl = item
                        S[j] = accum(S[j], a_sl, b_sl)
                    k_acc += bl
                for j in jg:
                    bj = min(sb, n - j * sb)
                    en_blk = exp_n[j * sb:j * sb + bj]
                    cj = flush(S[j], c_acc[j])
                    # apply sigma*tau through the integer exponent sum:
                    # materializing the fp64 scale product can overflow
                    # (e.g. 2^601 * 2^601) and then NaN-poison truncated
                    # zeros via inf*0, while ldexp is exact and saturates
                    # per element only when the true value overflows —
                    # an intended outcome, so the overflow warning is
                    # suppressed (np.seterr(over='raise') users would
                    # otherwise get a spurious FloatingPointError)
                    with np.errstate(over="ignore"):
                        if not c_nm:
                            out = alpha * np.ldexp(
                                cj[:bi, :bj],
                                em_blk[:, None] + en_blk[None, :])
                        else:
                            out = alpha * np.ldexp(
                                cj[:bj, :bi],
                                en_blk[:, None] + em_blk[None, :])
                    if beta != 0.0:
                        old = c.read_block_storage(i * sb, bi, j * sb, bj)
                        # tile-major C reads back the full padded tile
                        out = out + beta * (
                            old[:out.shape[0], :out.shape[1]]
                            .astype(np.float64))
                    if multihost:
                        # persist only this process's owned storage-major
                        # regions (the union over processes covers the
                        # tile exactly once — mesh._writeback_shards)
                        for (x0, x1), (y0, y1) in owned_regions:
                            x1c = min(x1, out.shape[0])
                            y1c = min(y1, out.shape[1])
                            if x0 >= x1c or y0 >= y1c:
                                continue
                            data = np.ascontiguousarray(
                                out[x0:x1c, y0:y1c])
                            if not c_nm:  # storage rows = logical rows
                                tickets.push(c.write_block_storage_async(
                                    i * sb + x0, j * sb + y0,
                                    x1c - x0, y1c - y0, data))
                            else:  # storage rows = logical cols
                                tickets.push(c.write_block_storage_async(
                                    i * sb + y0, j * sb + x0,
                                    y1c - y0, x1c - x0, data))
                        continue
                    if c_tiled:  # tile-major C stores the full padded tile
                        full = np.zeros((sb, sb), np.float64)
                        full[:out.shape[0], :out.shape[1]] = out
                        out = full
                    tickets.push(c.write_block_storage_async(
                        i * sb, j * sb, bi, bj, np.ascontiguousarray(out)))
    except BaseException as e:
        if not errors:
            errors.append(e)  # stop the producer before re-raising
        while prod_t.is_alive():
            prod_t.join(timeout=30)
            break
        raise
    prod_t.join()
    if errors:
        raise errors[0]
    tickets.wait_all()
    c.store.flush()
    hbm.clear()
    METRICS.add("gemm64.ms", timer.elapsed_ms())
    LOG.debug("gemm64 %dx%dx%d (s=%d) done in %.1f ms",
              m, n, k, s, timer.elapsed_ms())
