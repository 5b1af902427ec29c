"""Test config: force an 8-device virtual CPU mesh.

The axon sitecustomize (PYTHONPATH=/root/.axon_site) imports jax and pins
JAX_PLATFORMS=axon (the real TPU) at interpreter start — before any
conftest code can run.  Sharding tests need 8 virtual CPU devices, so when
we detect the axon platform we re-run pytest once in a subprocess with a
scrubbed environment, suspending pytest's capture so the child's output
streams through.
"""
import os
import sys

import numpy as np
import pytest


def _needs_reexec() -> bool:
    return (os.environ.get("BOF_TEST_REEXEC") != "1"
            and os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"))


def pytest_configure(config):
    if not _needs_reexec():
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        return
    import subprocess
    env = dict(os.environ)
    env["BOF_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pp) if pp else ""
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    proc = subprocess.Popen(
        [sys.executable, "-m", "pytest"]
        + list(config.invocation_params.args),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, bufsize=1)
    out = sys.__stdout__ if sys.__stdout__ is not None else sys.stdout
    for line in proc.stdout:
        out.write(line)
        out.flush()
    os._exit(proc.wait())


def pytest_collection_modifyitems(config, items):
    """Default-on fast suite (VERDICT r4 #5): tests marked `slow` (the
    bench-mode subprocess sweeps and the README end-to-end sweep, ~10 min
    of the 14-min full run) are skipped unless BOF_SLOW=1.  The fast suite
    stays under ~5 min on this 1-core box so it is actually run on every
    change; run `BOF_SLOW=1 python -m pytest tests/ -q` before committing
    bench/pipeline changes."""
    if os.environ.get("BOF_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: opt in with BOF_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def ctx(tmp_path):
    """Fresh context per test with a small budget so eviction paths run."""
    from bof_tpu import FlashConfig, FlashContext
    cfg = FlashConfig(scratch_dir=str(tmp_path / "scratch"),
                      n_io_threads=4, n_compute_threads=2,
                      program_budget=256 << 20)
    c = FlashContext(cfg)
    yield c
    c.destroy()
