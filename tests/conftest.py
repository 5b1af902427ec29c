"""Test config: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip hardware is unavailable in CI; sharding paths are validated on a
virtual host-platform mesh.  Kernels auto-fall-back to XLA (interpret mode
for Pallas) on CPU.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


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
