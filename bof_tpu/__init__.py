"""bof_tpu — TPU-native out-of-core linear algebra.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
microsoft/BLAS-on-flash: dense and sparse BLAS kernels plus data-processing
primitives over matrices resident on SSD, far larger than HBM, streamed
through a budgeted host tile cache into a double-buffered host->HBM->MXU
pipeline.
"""
from .config import DEFAULT_CONFIG, FlashConfig
from .context import FlashContext, flash_destroy, flash_setup, get_context
from .core import (FlashArray, TiledFlashArray, flash_empty, flash_free,
                   map_array, map_tiled_array, mem_array)
from .core.tiled_array import repack, unpack
from .io import MemStore, StrideInfo
from .lib_funcs import flash_memcpy, flash_memset, flash_truncate
from .ops import bof_map, bof_reduce, bof_sort, gemm, gemm_in_mem
from .utils.lexkey import lex_composite
from .ops.gemm64 import gemm64
from .ops.kmeans import kmeans_fit, lloyds_iter
from .sparse import (CsrFlashMatrix, csrcsc, csrcsc_scratch, csrgemv,
                     csrmm)
from .apps import (block_lanczos_svd, block_power_svd, topic_model,
                   xml_rank)

__version__ = "0.3.0"

__all__ = [
    "DEFAULT_CONFIG", "FlashConfig", "FlashContext", "flash_destroy",
    "flash_setup", "get_context", "FlashArray", "flash_empty", "flash_free",
    "map_array", "mem_array", "MemStore", "StrideInfo",
    "flash_memcpy", "flash_memset", "flash_truncate", "gemm64",
    "TiledFlashArray", "map_tiled_array", "repack", "unpack",
    "bof_map", "bof_reduce", "bof_sort", "gemm", "gemm_in_mem",
    "lex_composite",
    "kmeans_fit", "lloyds_iter",
    "CsrFlashMatrix", "csrcsc", "csrcsc_scratch", "csrgemv", "csrmm",
    "block_lanczos_svd", "block_power_svd", "topic_model", "xml_rank",
]
