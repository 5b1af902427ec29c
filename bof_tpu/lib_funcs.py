"""Flash memory/utility functions (reference: include/lib_funcs.h).

The reference exposes flash_malloc/flash_free (scratch files),
flash_memset/flash_memcpy, read_sync/write_sync and flash_truncate over
flash_ptrs (lib_funcs.h:49-128).  The allocation pair lives in
core/flash_array.py (flash_empty/flash_free); the block-wise memory ops
live here, streamed through the store API so they work on operands far
larger than RAM.
"""
from __future__ import annotations

import numpy as np

from .core.flash_array import FlashArray
from .io.stride import StrideInfo

_CHUNK = 64 << 20  # stream granularity in bytes


def flash_memset(arr: FlashArray, byte_value: int = 0) -> None:
    """Fill an array's backing bytes (reference: flash_memset,
    lib_funcs.h:49-54)."""
    total = arr.nbytes
    chunk = np.full(min(_CHUNK, total), byte_value, np.uint8)
    off = arr.offset
    done = 0
    tickets = []
    while done < total:
        c = min(len(chunk), total - done)
        tickets.append(arr.store.write(off + done,
                                       StrideInfo.contiguous(c), chunk[:c]))
        done += c
    for t in tickets:
        t.wait()
    arr.store.flush()


def flash_memcpy(dst: FlashArray, src: FlashArray) -> None:
    """Copy src's bytes into dst, streamed in chunks (reference:
    flash_memcpy, lib_funcs.h:56-60; FlashFileHandle::copy goes
    read->DRAM->write the same way, flash_file_handle.cpp:409-427)."""
    if dst.nbytes != src.nbytes:
        raise ValueError(f"size mismatch: {dst.nbytes} != {src.nbytes}")
    total = src.nbytes
    done = 0
    pending = []
    while done < total:
        c = min(_CHUNK, total - done)
        buf = np.empty(c, np.uint8)
        src.store.read(src.offset + done, StrideInfo.contiguous(c),
                       buf).wait()
        pending.append(dst.store.write(dst.offset + done,
                                       StrideInfo.contiguous(c), buf))
        done += c
    for t in pending:
        t.wait()
    dst.store.flush()


def flash_truncate(arr: FlashArray, n_elems: int) -> FlashArray:
    """Shrink a 1-D array (reference: flash_truncate, lib_funcs.h:89-99)."""
    if len(arr.shape) != 1 or n_elems > arr.shape[0]:
        raise ValueError("can only truncate 1-D arrays downward")
    arr.store.truncate(arr.offset + n_elems * arr.itemsize)
    return FlashArray(arr.store, (n_elems,), arr.dtype, arr.order,
                      arr.offset, ctx=arr.ctx)
