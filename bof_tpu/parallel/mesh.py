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


def sharded_accum_step(mesh, prec: str = "highest", a_km: bool = False,
                       b_nk: bool = False, c_nm: bool = False):
    """Returns jitted step(c, a, b, alpha) with the sharding above,
    generalized over storage layouts exactly like ops/device.accum_step:
    a storage (bm,bk) or (bk,bm); b (bk,bn) or (bn,bk); c (bm,bn) or
    (bn,bm).  The m dim shards over x, K over y, and the n dim is
    psum_scattered over y — dot_general contracting dims absorb the
    transposes, so every {order}x{transA}x{transB} config runs
    multi-chip with zero data transposition."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..ops.device import _precision

    a_spec = P("y", "x") if a_km else P("x", "y")
    b_spec = P(None, "y") if b_nk else P("y", None)
    c_spec = P("y", "x") if c_nm else P("x", "y")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(c_spec, a_spec, b_spec, P()),
        out_specs=c_spec)
    def step(c_loc, a_loc, b_loc, alpha):
        ka = 0 if a_km else 1
        kb = 1 if b_nk else 0
        if not c_nm:
            part = jax.lax.dot_general(
                a_loc, b_loc, (((ka,), (kb,)), ((), ())),
                precision=_precision(prec),
                preferred_element_type=c_loc.dtype)
            scatter_dim = 1  # n dim of the (m, n) partial
        else:
            part = jax.lax.dot_general(
                b_loc, a_loc, (((kb,), (ka,)), ((), ())),
                precision=_precision(prec),
                preferred_element_type=c_loc.dtype)
            scatter_dim = 0  # n dim of the (n, m) partial
        red = jax.lax.psum_scatter(part, "y",
                                   scatter_dimension=scatter_dim,
                                   tiled=True)
        return c_loc + alpha.astype(c_loc.dtype) * red

    return jax.jit(step, donate_argnums=(0,))


def sharding_for(mesh, spec):
    from jax.sharding import NamedSharding
    return NamedSharding(mesh, spec)


def gemm_sharded(a, b, c, alpha: float = 1.0, beta: float = 0.0,
                 transa: str = "N", transb: str = "N",
                 blk: Optional[int] = None, mesh=None, ctx=None) -> None:
    """Multi-chip out-of-core GEMM: the single-chip streaming structure of
    ops/gemm.py with every superblock device-sharded over the mesh; all 8
    {order}x{transA}x{transB} configs via storage-major blocks (no host or
    device transposition — shardings and contracting dims absorb it)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..context import get_context
    from ..ops.gemm import _op_block_reader, _storage_shape
    from ..utils import cdiv

    ctx = ctx or c.ctx or get_context()
    cfg = ctx.config
    mesh = mesh or make_mesh()
    px, py = mesh.devices.shape
    sb = blk or cfg.gemm_blk_size
    lcm = int(np.lcm(px, py))
    sb = max(lcm, (sb // lcm) * lcm)
    ta, tb = transa.upper() == "T", transb.upper() == "T"

    m, n = c.shape
    k = a.shape[0] if ta else a.shape[1]
    if (a.shape != ((k, m) if ta else (m, k))
            or b.shape != ((n, k) if tb else (k, n))):
        raise ValueError("operand shapes inconsistent with transposes")

    a_access, a_km = _op_block_reader(a, ta)
    b_access, b_nk = _op_block_reader(b, tb)
    c_nm = c.order == "C"
    step = sharded_accum_step(mesh, getattr(cfg, "matmul_precision",
                                            "highest"),
                              a_km=a_km, b_nk=b_nk, c_nm=c_nm)
    sh_a = sharding_for(mesh, P("y", "x") if a_km else P("x", "y"))
    sh_b = sharding_for(mesh, P(None, "y") if b_nk else P("y", None))
    sh_c = sharding_for(mesh, P("y", "x") if c_nm else P("x", "y"))

    def pad(mat, shape):
        if mat.shape == shape:
            return mat
        out = np.zeros(shape, mat.dtype)
        out[:mat.shape[0], :mat.shape[1]] = mat
        return out

    def read_storage(arr, access, i0, l0, d0, d1):
        (off, sinfo), st_shape = access(i0, l0, d0, d1)
        raw = arr.store.read_sync(off, sinfo)
        return raw.view(arr.dtype).reshape(st_shape)

    mB, nB, kB = cdiv(m, sb), cdiv(n, sb), cdiv(k, sb)
    for j in range(nB):
        bj = min(sb, n - j * sb)
        for i in range(mB):
            bi = min(sb, m - i * sb)
            if beta != 0.0:
                c_host = pad(c.read_block_storage(i * sb, bi, j * sb, bj),
                             (sb, sb))
                c_dev = jax.device_put(
                    np.dtype(c.dtype).type(beta) * c_host, sh_c)
            else:
                c_dev = jax.device_put(np.zeros((sb, sb), c.dtype), sh_c)
            for l in range(kB):
                bl = min(sb, k - l * sb)
                a_host = pad(read_storage(a, a_access, i * sb, l * sb,
                                          bi, bl), (sb, sb))
                b_host = pad(read_storage(b, b_access, l * sb, j * sb,
                                          bl, bj), (sb, sb))
                c_dev = step(c_dev,
                             jax.device_put(a_host, sh_a),
                             jax.device_put(b_host, sh_b),
                             np.dtype(c.dtype).type(alpha))
            ci = _storage_shape(c, (bi, bj))
            c.write_block_storage(i * sb, j * sb, bi, bj,
                                  np.asarray(c_dev)[:ci[0], :ci[1]])
    c.store.flush()
