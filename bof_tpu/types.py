"""Type and precision conventions (reference: include/bof_types.h).

The reference fixes FBLAS_INT/FBLAS_UINT to 64-bit and selects FPTYPE
(float or double) at compile time, dispatching every MKL call through
macros (bof_types.h:14-42).  Here the element type travels with each
FlashArray and the device steps are polymorphic over it; these constants
and helpers document the conventions:

- indices (`IDX_DTYPE`): int64 on disk for format parity with the
  reference's 64-bit .off/.col files; sparse device gathers down-cast to
  int32 (TPU-friendly) after nnz-budgeted blocking bounds block sizes.
- values (`FP_DTYPE`): float32 default.  float64 works end-to-end on CPU
  backends; on TPU, fp64 matmul is emulated and `matmul_precision=
  'highest'` fp32 (6-pass MXU) is the supported high-accuracy path —
  that is the TPU-native answer to the reference's FP_DOUBLE_PRECISION
  build flag.
"""
from __future__ import annotations

import numpy as np

IDX_DTYPE = np.int64       # on-disk index type (FBLAS_UINT analog)
IDX_DEVICE_DTYPE = np.int32  # device-side gather indices
FP_DTYPE = np.float32      # default FPTYPE
OFFSET_DTYPE = np.int64    # CSR offsets

SUPPORTED_FP = (np.float32, np.float64)


def check_fp_dtype(dtype) -> np.dtype:
    dt = np.dtype(dtype)
    if dt.type not in SUPPORTED_FP:
        raise TypeError(f"unsupported value dtype {dt}; use one of "
                        f"{[np.dtype(t).name for t in SUPPORTED_FP]}")
    return dt
