"""Utility-layer tests: alignment math, fnv hash, metrics, timer, logger."""
import logging
import time

import numpy as np

from bof_tpu.utils import (METRICS, Metrics, Timer, cdiv, fnv64a,
                           get_logger, is_sector_aligned, round_down,
                           round_up)
from bof_tpu.utils.logger import FlashFatal, fatal
from bof_tpu.utils.profiling import trace


def test_alignment_math():
    assert round_up(1, 512) == 512
    assert round_up(512, 512) == 512
    assert round_down(1023, 512) == 512
    assert cdiv(10, 3) == 4 and cdiv(9, 3) == 3
    assert is_sector_aligned(1024) and not is_sector_aligned(1000)


def test_fnv64a_known_vector():
    # FNV-1a 64-bit test vectors
    assert fnv64a(b"") == 0xCBF29CE484222325
    assert fnv64a(b"a") == 0xAF63DC4C8601EC8C


def test_metrics_counters():
    m = Metrics()
    m.add("x")
    m.add("x", 2.5)
    m.set("y", 7)
    assert m.get("x") == 3.5
    snap = m.snapshot()
    assert snap == {"x": 3.5, "y": 7}
    m.reset()
    assert m.get("x") == 0.0


def test_timer_monotonic():
    t = Timer()
    time.sleep(0.01)
    assert 5 <= t.elapsed_ms() < 5000
    t.reset()
    assert t.elapsed_ms() < 5000


def test_fatal_raises():
    import pytest
    with pytest.raises(FlashFatal):
        fatal("boom %d", 42)


def test_logger_levels():
    log = get_logger("bof.test")
    assert isinstance(log, logging.Logger)
    log.info("info line")  # must not raise


def test_trace_without_profiler():
    with trace("region"):
        x = np.ones(10).sum()
    assert x == 10


def test_cpu_compile_cache_is_machine_keyed():
    """CPU-backend processes must NOT share the tunnel's persistent
    compile cache: XLA's persisted CPU executables embed the compiling
    machine's feature set, and a stale entry from another host can
    SIGILL/abort at execute time (it killed the full suite mid-run at
    gemm_sharded's 8-device step).  ops/device.py keys the dir off
    JAX_PLATFORMS without initializing the backend."""
    import os
    import subprocess
    import sys

    code = ("import bof_tpu.ops.device, jax; "
            "print(jax.config.jax_compilation_cache_dir)")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "jax_cache_cpu_" in out.stdout, out.stdout

    env["JAX_PLATFORMS"] = "axon"  # tunnel runs keep the shared warm dir
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("jax_cache"), out.stdout


def test_machine_sig_copies_agree():
    """__graft_entry__ keeps a self-contained copy of _machine_sig (the
    driver-contract file must not depend on package internals at import
    time); bof_tpu.ops.device holds the canonical one.  They key the SAME
    per-host CPU compile-cache directory — drift would silently split the
    warm cache.  This test enforces the sync the code comments promise."""
    import importlib.util
    import os as _os

    import bof_tpu.ops.device as dev

    spec = importlib.util.spec_from_file_location(
        "graft_entry_sig", _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "__graft_entry__.py"))
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    assert g._machine_sig() == dev._machine_sig()
