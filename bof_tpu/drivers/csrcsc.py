"""CSR->CSC transpose driver (reference: drivers/csrcsc.cpp; note the
reference bumps compute threads around this call, csrcsc.cpp:58-61 — the
scheduler pool here is already sized by --compute-threads).

    python -m bof_tpu.drivers.csrcsc A_prefix m k OUT_prefix
"""
from __future__ import annotations

import numpy as np

from ..core.flash_array import map_array
from ..sparse import CsrFlashMatrix, csrcsc
from ._common import Timed, base_parser, make_context


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("a_prefix")
    p.add_argument("m", type=int)
    p.add_argument("k", type=int)
    p.add_argument("out_prefix")
    args = p.parse_args(argv)
    ctx = make_context(args)
    m, k = args.m, args.k
    A = CsrFlashMatrix.map_files(args.a_prefix, (m, k), ctx=ctx)
    ia = map_array(args.out_prefix + ".off", (k + 1,), np.int64,
                   create=True, ctx=ctx)
    ja = map_array(args.out_prefix + ".col", (A.nnz,), A.ja.dtype,
                   create=True, ctx=ctx)
    vals = map_array(args.out_prefix + ".csr", (A.nnz,), np.float32,
                     create=True, ctx=ctx)
    out = CsrFlashMatrix(ia, ja, vals, (k, m))
    with Timed("csrcsc", nbytes=2.0 * A.nnz * 12.0):
        csrcsc(A, out, ctx=ctx)
    print(f"nnz {out.nnz}")
    ctx.destroy()


if __name__ == "__main__":
    main()
