"""CSR gemv driver (reference: drivers/csrgemv.cpp).

    python -m bof_tpu.drivers.csrgemv A_prefix m k x.bin y.bin [--trans N|T]
"""
from __future__ import annotations

import numpy as np

from ..sparse import CsrFlashMatrix, csrgemv
from ._common import Timed, base_parser, checksum, make_context


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("a_prefix")
    p.add_argument("m", type=int)
    p.add_argument("k", type=int)
    p.add_argument("x_path")
    p.add_argument("y_path")
    p.add_argument("--trans", default="N", choices="NT")
    args = p.parse_args(argv)
    ctx = make_context(args)
    A = CsrFlashMatrix.map_files(args.a_prefix, (args.m, args.k), ctx=ctx)
    xlen = args.m if args.trans == "T" else args.k
    x = np.fromfile(args.x_path, np.float32, count=xlen)
    with Timed("csrgemv", flops=2.0 * A.nnz, nbytes=A.nnz * 12.0):
        y = csrgemv(A, x, trans=args.trans, ctx=ctx)
    y.tofile(args.y_path)
    print(f"checksum {checksum(y)}")
    ctx.destroy()


if __name__ == "__main__":
    main()
