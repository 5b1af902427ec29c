"""Data-parallel Lloyd step over a device mesh.

New capability beyond the single-node reference (SURVEY §2.6): the fused
Lloyd block step of ops/kmeans.py, sharded point-wise over all mesh
devices.  Each device computes assignments for its point shard on its MXU
and reduces per-center sums/counts with `psum` over the flattened mesh —
the collective rides ICI; centers stay replicated.
"""
from __future__ import annotations

import functools

import numpy as np


def dp_lloyd_step(mesh, prec: str = "highest"):
    """Returns jitted step(points, centers) -> (sums, counts, inertia_part)
    with points sharded over every mesh axis on dim 0 and outputs
    replicated (already psum-reduced)."""
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.device import _precision

    axes = mesh.axis_names

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(axes), P()),
        out_specs=(P(), P(), P()))
    def step(p_loc, w_loc, centers):
        # w_loc: 1.0 for real points, 0.0 for shard-padding rows.  Pad rows
        # are masked out of every statistic explicitly — relying on exact
        # fp32 tie-breaking to route pad points to a known center is not
        # sound (pd is computed with independent roundings per center).
        c_norms = jnp.sum(centers * centers, axis=1)
        g = jnp.dot(p_loc, centers.T, precision=_precision(prec),
                    preferred_element_type=jnp.float32)
        pd = c_norms[None, :] - 2.0 * g
        labels = jnp.argmin(pd, axis=1)
        mind = jnp.min(pd, axis=1)
        onehot = jax.nn.one_hot(labels, centers.shape[0],
                                dtype=jnp.float32) * w_loc[:, None]
        sums = jnp.dot(onehot.T, p_loc, preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        inertia = jnp.sum(mind * w_loc) + jnp.sum(
            (p_loc * p_loc) * w_loc[:, None])
        for ax in axes:
            sums = jax.lax.psum(sums, ax)
            counts = jax.lax.psum(counts, ax)
            inertia = jax.lax.psum(inertia, ax)
        return sums, counts, inertia[None]

    return jax.jit(step)


def lloyds_iter_sharded(points_np: np.ndarray, centers: np.ndarray,
                        mesh=None, prec: str = "highest"):
    """One data-parallel Lloyd iteration over host-resident points
    (the out-of-core loop feeds successive shards through this step)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import make_mesh

    mesh = mesh or make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    n, d = points_np.shape
    pad = (-n) % n_dev
    centers = np.ascontiguousarray(centers, np.float32)
    weights = np.ones(n + pad, np.float32)
    if pad:
        # pad rows are zero-weighted in the device step, so their values
        # are irrelevant — zeros keep the shard shapes uniform
        points_np = np.concatenate([points_np, np.zeros((pad, d))])
        weights[n:] = 0.0
    step = dp_lloyd_step(mesh, prec)
    sh = NamedSharding(mesh, P(mesh.axis_names))
    p = jax.device_put(points_np.astype(np.float32), sh)
    w = jax.device_put(weights, sh)
    c = jax.device_put(centers, NamedSharding(mesh, P()))
    sums, counts, inertia = step(p, w, c)
    sums = np.array(sums)
    counts = np.array(counts)
    inertia = float(np.asarray(inertia).sum())
    safe = np.maximum(counts, 1.0)[:, None]
    new_centers = np.where(counts[:, None] > 0, sums / safe, centers)
    return new_centers.astype(np.float32), inertia, counts
