"""Device mesh construction and sharded GEMM steps.

New capability beyond the reference (which is strictly single-node,
SURVEY §2.6): the out-of-core superblock accumulate step scaled over a 2-D
`jax.sharding.Mesh`.  Sharding layout for C += A @ B on mesh axes
("x", "y"):

    A superblock: rows over x, K over y        P("x", "y")
    B superblock: K over y, cols replicated    P("y", None)
    C superblock: rows over x, cols over y     P("x", "y")

Each device multiplies its local (m/x, K/y) x (K/y, n) panel on the MXU
and a `psum_scatter` over y both reduces the K partial sums and scatters
the n dimension — the collective rides ICI, and C never materializes
unsharded.  The host tile pipeline feeds superblocks exactly as in the
single-chip path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("x", "y")):
    """Build a near-square 2-D mesh over the first n_devices.  If the
    default backend has too few devices (e.g. a single attached chip) but
    the host platform was configured with virtual CPU devices
    (--xla_force_host_platform_device_count), fall back to those."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n:
            devs = cpu
        else:
            raise ValueError(
                f"need {n} devices; have {len(devs)} on "
                f"{jax.default_backend()} and {len(cpu)} cpu")
    devs = devs[:n]
    px = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            px = cand
            break
    mesh_devs = np.array(devs).reshape(px, n // px)
    return Mesh(mesh_devs, axis_names)


def sharded_accum_step(mesh, prec: str = "highest"):
    """Returns jitted step(c, a, b, alpha) with the sharding above.
    Shapes: c (bm, bn), a (bm, bk), b (bk, bn) — bm % x == 0,
    bk % y == 0, bn % (y) == 0 for the scatter."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..ops.device import _precision

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("x", "y"), P("x", "y"), P("y", None), P()),
        out_specs=P("x", "y"))
    def step(c_loc, a_loc, b_loc, alpha):
        part = jnp.dot(a_loc, b_loc, precision=_precision(prec),
                       preferred_element_type=c_loc.dtype)
        # reduce over K shards and scatter the n dim over y in one
        # collective (rides ICI)
        red = jax.lax.psum_scatter(part, "y", scatter_dimension=1,
                                   tiled=True)
        return c_loc + alpha.astype(c_loc.dtype) * red

    return jax.jit(step, donate_argnums=(0,))


def sharding_for(mesh, spec):
    from jax.sharding import NamedSharding
    return NamedSharding(mesh, spec)


def gemm_sharded(a, b, c, alpha: float = 1.0, beta: float = 0.0,
                 blk: Optional[int] = None, mesh=None, ctx=None) -> None:
    """Multi-chip out-of-core GEMM: the single-chip streaming loop of
    ops/gemm.py with every superblock device-sharded over the mesh.
    Row-major, no-transpose operands (the common case); the general
    configs run single-chip."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..context import get_context
    from ..utils import cdiv

    ctx = ctx or c.ctx or get_context()
    cfg = ctx.config
    mesh = mesh or make_mesh()
    px, py = mesh.devices.shape
    sb = blk or cfg.gemm_blk_size
    lcm = int(np.lcm(px, py))
    sb = max(lcm, (sb // lcm) * lcm)

    m, n = c.shape
    k = a.shape[1]
    if a.shape != (m, k) or b.shape != (k, n):
        raise ValueError("gemm_sharded expects A (m,k), B (k,n), C (m,n)")
    if not (a.order == b.order == c.order == "R"):
        raise ValueError("gemm_sharded: row-major operands only")

    step = sharded_accum_step(mesh, getattr(cfg, "matmul_precision",
                                            "highest"))
    sh_a = sharding_for(mesh, P("x", "y"))
    sh_b = sharding_for(mesh, P("y", None))
    sh_c = sharding_for(mesh, P("x", "y"))

    def pad(mat, shape):
        if mat.shape == shape:
            return mat
        out = np.zeros(shape, mat.dtype)
        out[:mat.shape[0], :mat.shape[1]] = mat
        return out

    mB, nB, kB = cdiv(m, sb), cdiv(n, sb), cdiv(k, sb)
    for j in range(nB):
        bj = min(sb, n - j * sb)
        for i in range(mB):
            bi = min(sb, m - i * sb)
            if beta != 0.0:
                c_host = pad(c.read_block(i * sb, bi, j * sb, bj), (sb, sb))
                c_dev = jax.device_put(
                    np.dtype(c.dtype).type(beta) * c_host, sh_c)
            else:
                c_dev = jax.device_put(np.zeros((sb, sb), c.dtype), sh_c)
            for l in range(kB):
                bl = min(sb, k - l * sb)
                a_host = pad(a.read_block(i * sb, bi, l * sb, bl), (sb, sb))
                b_host = pad(b.read_block(l * sb, bl, j * sb, bj), (sb, sb))
                c_dev = step(c_dev,
                             jax.device_put(a_host, sh_a),
                             jax.device_put(b_host, sh_b),
                             np.dtype(c.dtype).type(alpha))
            c.write_block(i * sb, np.asarray(c_dev)[:bi, :bj], j * sb)
    c.store.flush()
