"""Runtime configuration for bof_tpu.

The reference library configures everything at compile time via ~25 CMake
cache variables (reference: CMakeLists.txt:38-91 — N_IO_THR, N_COMPUTE_THR,
PROGRAM_BUDGET, SECTOR_LEN, GEMM_BLK_SIZE, CSRMM_* block sizes, MAX_NNZS,
...).  Here they are a runtime dataclass, overridable per-context and
per-kernel call.
"""
from __future__ import annotations

import dataclasses
import os

SECTOR_LEN = 512  # SSD sector size; O_DIRECT alignment granularity


@dataclasses.dataclass
class FlashConfig:
    """All runtime knobs.  Defaults mirror the reference's CMake defaults
    where a direct analog exists (reference: CMakeLists.txt:38-91)."""

    # ---- I/O engine (reference: N_IO_THR, MAX_SIMUL_REQS, MAX_EVENTS) ----
    n_io_threads: int = 8
    max_simul_reqs: int = 64           # in-flight kernel-AIO iocbs (<=128)
    max_chunk_bytes: int = 32 << 20    # split requests larger than this
    use_o_direct: bool = False         # O_DIRECT on file stores (bench.py
    #   sets True so the measured path exercises kernel AIO)
    io_backend: str = "auto"           # "native" | "python" | "auto"

    # ---- scheduler / cache (reference: N_COMPUTE_THR, PROGRAM_BUDGET) ----
    n_compute_threads: int = 4
    program_budget: int = 8 << 30      # host tile-cache budget in bytes
    enable_prioritizer: bool = True
    single_use_discard: bool = False
    max_in_mem_tasks_factor: int = 4   # max in-flight tasks = factor * n_compute
    tile_cache_backend: str = "auto"   # pin cache: "auto"|"native"|"python"

    # ---- device pipeline (new; no reference analog — TPU-specific) ----
    hbm_budget: int = 12 << 30         # HBM working-set budget for tiles
    pipeline_depth: int = 3            # lookahead superblocks in flight
    device_compute: str = "auto"       # "pallas" | "xla" | "auto"
    transfer_dtype: str = "float32"    # "bfloat16" halves the host->HBM
    #   bytes of A/B tiles (inputs rounded to bf16 on the host; the
    #   accumulator and C stay fp32) — for link-bound deployments that
    #   accept ~1e-3 relative input rounding.  "int8" QUARTERS them:
    #   per-tile max-abs quantization on the host, exact int8 MXU
    #   products with one f32 rescale per tile (~0.4%-of-tile-max input
    #   rounding).  Sparse kernels honor both: the streamed va half of
    #   every ELL upload ships bf16 ("bfloat16") or int8 with a per-ROW
    #   max-abs scale ("int8" — row-wise because block-wide scales crush
    #   power-law rows; ~0.4% row-relative band) and is promoted back to
    #   the panel dtype in HBM before the reduce (B panels are amortized
    #   per column panel, so they stay f32 and set the accumulate
    #   precision); fp64 values, the Lanczos one-pass operator (fp64
    #   host accumulator), and the shard_map (sharded/xml_rank) paths
    #   keep plain full-precision arrays.
    c_transfer_dtype: str = "float32"  # "bfloat16" halves the DEVICE->host
    #   bytes of finished C superblocks in gemm AND of csrmm device
    #   result blocks (cast on device, promoted
    #   back to fp32 on the host before write-back; storage stays fp32).
    #   The K accumulation is untouched — only the final download rounds,
    #   so the error is one bf16 output rounding (~4e-3 relative), which
    #   is noise next to transfer_dtype="int8"'s input rounding.  On
    #   link-bound paths where A/B already ship compressed, the C
    #   download is the remaining link term (reference analog: the
    #   write-back path of evict, cache.cpp:72-113 — the reference always
    #   pays full-width writes; a TPU link tier can cheat).

    # ---- dense kernels (reference: GEMM_BLK_SIZE=8192) ----
    gemm_blk_size: int = 8192          # superblock edge for out-of-core gemm
    fp64_device: str = "auto"          # float64 gemm on accelerators with
    #   no fp64 unit: "sliced" = Ozaki-style error-free int8 mantissa
    #   slicing on the MXU (ops/gemm64.py — exact int8 products, fp64
    #   host accumulation; no jax x64 needed) | "native" = require a
    #   backend with real fp64 (JAX x64 on CPU) | "auto" = sliced on TPU,
    #   native elsewhere.  Reference FP_DOUBLE_PRECISION parity
    #   (bof_types.h:24-42).
    fp64_slices: int = 8               # int8 mantissa slices for the
    #   sliced fp64 path: 6+7(s-1) bits; 8 covers the full 53-bit fp64
    #   mantissa (truncation 2^-56 of the row/col scale)
    gemm_tile: tuple = (512, 512, 512)  # pallas (bm, bn, bk) MXU tile
    matmul_precision: str = "highest"  # "highest" = fp32 parity (6-pass
    #   MXU emulation) | "high" | "default" (bf16 passes, ~3-6x faster);
    #   a declared field so dataclasses.replace() copies preserve it

    # ---- sparse kernels (reference: MAX_NNZS, CSRMM_*_CBLK_SIZE) ----
    max_nnzs: int = 1 << 26            # nnz budget per CSR row block
    csrmm_cblk_size: int = 4096        # column block width for csrmm
    csrgemv_blk_size: int = 1 << 20    # rows per csrgemv block
    sparse_compute: str = "auto"       # "device" (ELL on TPU) | "host" | "auto"
    #   "host" runs block products on CPU (scipy) — the reference's
    #   execution model, and faster when the host<->device link is thin;
    #   "auto" measures the link once and places compute per problem
    sparse_device_impl: str = "auto"   # device ELL kernel: "xla" (take+
    #   reduce) | "pallas" (VMEM-resident gather, spmm_pallas.py) |
    #   "auto" (measured: XLA everywhere on v5e)
    ell_sort_rows: bool = True         # count-sorted ELL banding in the
    #   csrmm device path: range over rows sorted by nnz so each band's
    #   rmax is tight to its rows, not the block max — cuts ELL padding
    #   bytes/FLOPs on skewed (power-law) blocks
    ell_idx_narrow: bool = True        # ship ELL column indices as uint16
    #   whenever the B panel height fits 16 bits (<= 65536 rows; always
    #   true for bucketed column blocks): the ja half of every ELL upload
    #   is pure link bytes and device kernels widen to int32 in HBM, so
    #   this halves index bytes (25% of the ELL total) at zero accuracy
    #   cost — indices are exact either way

    # ---- lib funcs (reference: MAP_BLK_SIZE, REDUCE_BLK_SIZE, SORT) ----
    map_blk_elems: int = 1 << 24       # elements per map/reduce block
    sort_blk_elems: int = 1 << 24      # elements per sort block
    sort_compute: str = "host"         # "host" (np.sort) | "device" (jnp)

    telemetry_sync: bool = False       # benchmark-truth mode: serialize
    #   each host<->device transfer behind a process-wide lock and sync it
    #   (scalar fetch) inside the timed window, so every reported per-stage
    #   GB/s is a real exclusive-channel transfer rate (<= the link probe)
    #   and per-tile rate samples expose in-run link drift.  Costs one
    #   ~30 ms round-trip per tile; leave off in production

    # ---- debug self-checking (reference: DEBUG builds compile ASan +
    # GLOG_ASSERT + write read-back verification + verify_csr_block) ----
    debug_checks: bool = False

    # ---- misc ----
    scratch_dir: str = dataclasses.field(
        default_factory=lambda: os.environ.get("BOF_SCRATCH", "/tmp/bof_tpu"))
    log_level: str = "info"

    def replace(self, **kw) -> "FlashConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = FlashConfig()
