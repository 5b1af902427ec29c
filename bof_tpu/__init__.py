"""bof_tpu — TPU-native out-of-core linear algebra.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
microsoft/BLAS-on-flash: dense and sparse BLAS kernels plus data-processing
primitives over matrices resident on SSD, far larger than HBM, streamed
through a budgeted host tile cache into a double-buffered host->HBM->MXU
pipeline.
"""
from .config import DEFAULT_CONFIG, FlashConfig
from .context import FlashContext, flash_destroy, flash_setup, get_context
from .core import FlashArray, flash_empty, flash_free, map_array, mem_array
from .io import MemStore, StrideInfo

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_CONFIG", "FlashConfig", "FlashContext", "flash_destroy",
    "flash_setup", "get_context", "FlashArray", "flash_empty", "flash_free",
    "map_array", "mem_array", "MemStore", "StrideInfo",
]
