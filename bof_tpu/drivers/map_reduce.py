"""map+reduce driver: map=sqrt then reduce=sum (reference:
drivers/map_reduce.cpp does exactly this composition).

    python -m bof_tpu.drivers.map_reduce in.bin out.bin n
"""
from __future__ import annotations

import numpy as np

from ..core.flash_array import map_array
from ..ops.map_reduce import bof_map, bof_reduce
from ._common import Timed, base_parser, make_context


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("in_path")
    p.add_argument("out_path")
    p.add_argument("n", type=int)
    args = p.parse_args(argv)
    ctx = make_context(args)
    import jax.numpy as jnp
    src = map_array(args.in_path, (args.n,), np.float32, ctx=ctx)
    dst = map_array(args.out_path, (args.n,), np.float32, create=True,
                    ctx=ctx)
    with Timed("map(sqrt)", nbytes=8.0 * args.n):
        bof_map(src, dst, jnp.sqrt, ctx=ctx)
    with Timed("reduce(sum)", nbytes=4.0 * args.n):
        total = bof_reduce(dst, "sum", ctx=ctx)
    print(f"sum {total}")
    ctx.destroy()


if __name__ == "__main__":
    main()
