"""Device-side compute steps shared by the out-of-core kernels.

Replaces the reference's per-task MKL calls (reference: GemmTask::execute,
include/tasks/gemm_task.h:67-93 calls mkl_gemm on cached DRAM blocks): each
superblock accumulate step is a jitted MXU matmul on HBM-resident tiles,
with the K-dimension accumulate chain expressed as donated-buffer
`c += alpha * op(A) op(B)` steps — XLA's dataflow ordering plays the role
of the reference's parent-chain dependencies (gemm.cpp:114-126).

Blocks arrive in *storage-major* layout; `dot_general` contracting
dimensions absorb transposes so no host or device transposition ever
happens.  Output is produced directly in C's storage layout.
"""
from __future__ import annotations

import functools
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: kernel shapes are stable across processes,
# and a cold jit over the remote-compile tunnel costs tens of seconds.
# CPU-backend runs get a MACHINE-KEYED directory: XLA's persisted CPU
# executables embed the compiling machine's feature set, and a stale entry
# written by a different host can abort/SIGILL at execute time (the AOT
# loader itself warns "could lead to execution errors such as SIGILL"; one
# such entry aborted the full test suite mid-run at gemm_sharded's 8-device
# step).  TPU executables are target-keyed, so tunnel runs keep ONE shared
# dir for cross-process warmth.  The platform is decided from JAX_PLATFORMS
# alone — importing bof_tpu must never initialize the backend (a tunnel
# attach can take minutes).


def _machine_sig() -> str:
    """Stable signature of THIS machine's CPU features (mirrors
    __graft_entry__._machine_sig — keep in sync so the dryrun and the
    library share one warm CPU cache per host)."""
    import hashlib
    import platform
    feats = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    feats.append(line.strip())
                    if len(feats) >= 3:
                        break
    except OSError:
        feats.append(platform.processor())
    return hashlib.sha256("|".join(feats).encode()).hexdigest()[:12]


if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _plat = os.environ.get("JAX_PLATFORMS", "").lower()
    _cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "bof_tpu",
        "jax_cache" if ("axon" in _plat or "tpu" in _plat)
        else f"jax_cache_cpu_{_machine_sig()}")
    os.makedirs(_cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax
        pass


def backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    return backend() == "tpu"


def _precision(name: str):
    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


@functools.partial(jax.jit,
                   static_argnames=("a_km", "b_nk", "c_nm", "prec", "impl"),
                   donate_argnums=(0,))
def accum_step(c, a, b, alpha, *, a_km: bool, b_nk: bool, c_nm: bool,
               prec: str = "highest", impl: str = "xla"):
    """c += alpha * op(A) op(B), all in storage-major layout.

    a: (bm,bk) if not a_km else (bk,bm)
    b: (bk,bn) if not b_nk else (bn,bk)
    c: (bm,bn) if not c_nm else (bn,bm)   (and the result matches)

    impl='pallas' routes ALL storage layouts through the explicit MXU
    kernel in matmul_pallas.py — its in-kernel dot_general contracting
    dims absorb the transposes (layout-general since r3; previously only
    the canonical layout engaged and km/nk/nm fell back to XLA).
    """
    if impl == "pallas":
        from .matmul_pallas import bn_default, matmul
        bn0 = bn_default(prec)
        # feasibility gate (the sparse side's pallas_eligible analog):
        # only run the kernel on bucketed multiples of the tile sizes —
        # a full-dimension fallback tile would blow VMEM and mint a new
        # unbucketed compile per odd superblock (CLAUDE.md); anything
        # else quietly uses the equivalent XLA path below
        cm, cn = (c.shape[1], c.shape[0]) if c_nm else c.shape
        kdim = a.shape[0] if a_km else a.shape[1]
        if cm % 512 == 0 and cn % bn0 == 0 and kdim % 512 == 0:
            # out_dtype=c.dtype: partials accumulate at the ACCUMULATOR
            # precision even when A/B tiles arrived as bf16 transfers
            out = matmul(a, b, bm=512, bn=bn0, bk=512, prec=prec,
                         out_dtype=c.dtype, a_km=a_km, b_nk=b_nk,
                         c_nm=c_nm)
            return c + alpha.astype(c.dtype) * out
    ka = 1 if not a_km else 0
    kb = 0 if not b_nk else 1
    if not c_nm:
        out = jax.lax.dot_general(
            a, b, (((ka,), (kb,)), ((), ())),
            precision=_precision(prec), preferred_element_type=c.dtype)
    else:
        out = jax.lax.dot_general(
            b, a, (((kb,), (ka,)), ((), ())),
            precision=_precision(prec), preferred_element_type=c.dtype)
    return c + alpha.astype(c.dtype) * out


@functools.partial(jax.jit,
                   static_argnames=("a_km", "b_nk", "c_nm"),
                   donate_argnums=(0,))
def accum_step_q(c, a, b, scale, *, a_km: bool, b_nk: bool, c_nm: bool):
    """Quantized accumulate step for transfer_dtype='int8': a/b are
    per-tile max-abs int8 quantizations; the MXU multiplies
    int8 x int8 -> int32 EXACTLY and one fused f32 rescale
    (scale = alpha * scale_a * scale_b, a dynamic scalar — no retrace
    per tile) restores magnitude into the fp32 accumulator.  Input
    rounding is the only error source."""
    ka = 0 if a_km else 1
    kb = 1 if b_nk else 0
    if not c_nm:
        out = jax.lax.dot_general(a, b, (((ka,), (kb,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    else:
        out = jax.lax.dot_general(b, a, (((kb,), (ka,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    return c + scale.astype(c.dtype) * out.astype(c.dtype)


@functools.partial(jax.jit, donate_argnums=(0,))
def scale_init(c, beta):
    """C-block initialization for beta != 0 (reference reads C and lets MKL
    apply beta, gemm_task.h:49-54; we scale once before the K loop)."""
    return c * beta.astype(c.dtype)


def zeros_block(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


@jax.jit
def to_bf16(x):
    """Device-side cast for c_transfer_dtype='bfloat16': finished C
    superblocks round once on device so the D2H transfer ships half the
    bytes; the host promotes back to fp32 before write-back."""
    return x.astype(jnp.bfloat16)


def dtype_native_on_device(dt) -> bool:
    """True iff the default backend can hold `dt` EXACTLY.  With jax x64
    off (the default), jnp.asarray silently narrows 64-bit dtypes to 32 —
    a device round-trip then corrupts fp64/int64 data; TPU additionally
    has no fp64 unit even under x64.  Kernels with a host execution path
    (csrmm/csrgemv/sort/map — the reference's own MKL/OpenMP-on-host
    model) use this to keep 64-bit data off the device rather than lose
    precision silently; gemm instead routes fp64 to the exact sliced
    path (ops/gemm64.py)."""
    dt = np.dtype(dt)
    if dt.itemsize < 8:
        return True
    return _dtype64_native(dt.str, bool(jax.config.jax_enable_x64))


@functools.lru_cache(maxsize=None)
def _dtype64_native(dt_str: str, x64: bool) -> bool:
    """Cached per (dtype, x64 flag): the probe creates a device array —
    an RPC on tunnel transports — and the answer is constant for the
    process once the backend and x64 mode are fixed (the x64 flag is in
    the key so tests that flip it mid-process stay correct)."""
    dt = np.dtype(dt_str)
    if jnp.asarray(np.empty(0, dt)).dtype != dt:
        return False  # x64 disabled: silent 64 -> 32 narrowing
    return not (on_tpu() and dt.kind == "f")


def to_device(x: np.ndarray):
    return jax.device_put(x)


def from_device(x) -> np.ndarray:
    return np.asarray(x)


# Serializes host<->device transfers when FlashConfig.telemetry_sync is on:
# with exclusive channel use + a sync inside the timed window, a stage's
# measured GB/s is a true transfer rate (bounded by the link), not dispatch
# time.  The dev tunnel is one serial channel anyway (docs/PERFORMANCE.md:
# concurrent pulls don't scale), so the lock costs no real overlap there.
XFER_LOCK = threading.Lock()


@jax.jit
def _first_elem(x):
    return jnp.ravel(x)[:1]


def sync(x) -> None:
    """Block until `x` is materialized on device (its producing transfer
    or computation completed).  `block_until_ready` is a no-op through the
    dev tunnel (CLAUDE.md), so force a scalar fetch instead — one ~30 ms
    round trip."""
    np.asarray(_first_elem(x))


_link_gbps: float | None = None


def link_gbps_estimate(force: bool = False) -> float:
    """One-shot measured host->device transfer rate (GB/s), cached for the
    process.  Drives compute-placement heuristics: a real TPU host moves
    tens of GB/s; the dev tunnel moves ~0.04 GB/s, where shipping operands
    to the device can cost more than computing on the host (the
    reference's own execution model is host MKL)."""
    global _link_gbps
    if _link_gbps is None or force:
        import time
        # incompressible payload: the tunnel compresses zero-ish buffers
        # ~2x, which would overestimate the rate real (random-float)
        # tiles achieve and misplace compute
        x = np.random.default_rng(99).integers(0, 256, 8 << 20,
                                               dtype=np.uint8)
        d = jax.device_put(x[:1 << 16])  # warm the path
        np.asarray(jnp.sum(d[:1]))
        t0 = time.perf_counter()
        d = jax.device_put(x)
        float(np.asarray(jnp.sum(d[:1])))  # force materialization
        _link_gbps = x.nbytes / max(time.perf_counter() - t0, 1e-9) / 1e9
    return _link_gbps
