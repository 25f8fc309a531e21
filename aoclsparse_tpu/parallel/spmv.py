"""Distributed SpMV over a jax.sharding Mesh.

The TPU-native rebuild of the reference's OpenMP row-partition parallelism
(level2/aoclsparse_csrmv_kt.cpp:53 `#pragma omp parallel for` over rows;
SURVEY.md §2.9): rows of the padded execution format are sharded over the
mesh's "x" axis, the dense input vector is all-gathered over ICI (the analog
of shared-memory reads of x), and each shard runs the local gather-multiply-
reduce kernel. XLA overlaps the all-gather with local compute where possible.

Partitioning is row-balanced by padding m to a multiple of n_devices *
SUBLANE; nnz balancing lands with the planner's distributed mode.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["make_mesh", "shard_ell", "dist_spmv_ell", "dist_spmv_ell_sharded_x"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _pad_rows(a, m_pad):
    if a.shape[0] == m_pad:
        return a
    pad = [(0, m_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    fill = -1 if jnp.issubdtype(a.dtype, jnp.integer) else 0
    return jnp.pad(a, pad, constant_values=fill)


def shard_ell(mesh: Mesh, ell_ind, ell_val, axis: str = "x"):
    """Pad the padded-row (m, w) arrays to a device multiple and place them
    row-sharded on the mesh."""
    n = mesh.shape[axis]
    m = ell_ind.shape[0]
    m_pad = -(-m // n) * n
    sh = NamedSharding(mesh, P(axis, None))
    ind = jax.device_put(_pad_rows(ell_ind, m_pad), sh)
    val = jax.device_put(_pad_rows(ell_val, m_pad), sh)
    return ind, val, m_pad


def dist_spmv_ell(mesh: Mesh, ell_ind, ell_val, x, axis: str = "x"):
    """y = A @ x with A row-sharded and x replicated: embarrassingly parallel,
    each device reduces its row block (the direct OpenMP-row-split analog)."""
    xr = jax.device_put(x, NamedSharding(mesh, P()))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=P(axis),
    )
    def _local(ind, val, xloc):
        g = jnp.take(xloc, jnp.maximum(ind, 0), axis=0)
        prods = jnp.where(ind >= 0, val * g, jnp.zeros((), dtype=val.dtype))
        return jnp.sum(prods, axis=1)

    return _local(ell_ind, ell_val, xr)


def dist_spmv_ell_sharded_x(mesh: Mesh, ell_ind, ell_val, x_sharded, axis: str = "x"):
    """y = A @ x with BOTH A rows and x sharded: x shards are all-gathered
    over the mesh axis (ICI collective — the halo-exchange analog of shared-
    memory x reads; SURVEY.md §5.8) before the local reduce."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis),
    )
    def _local(ind, val, xloc):
        xall = jax.lax.all_gather(xloc, axis, tiled=True)
        g = jnp.take(xall, jnp.maximum(ind, 0), axis=0)
        prods = jnp.where(ind >= 0, val * g, jnp.zeros((), dtype=val.dtype))
        return jnp.sum(prods, axis=1)

    return _local(ell_ind, ell_val, x_sharded)
