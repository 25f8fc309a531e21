"""Distributed multi-RHS triangular solve.

The reference parallelizes TRSM across RHS columns with OpenMP
(level3/aoclsparse_trsm.hpp:149); the mesh analog shards B's columns over
the axis while the blocked operand (D, Lwin) replicates — each device runs
the scan solve on its column slab, no collectives at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .placement import put

__all__ = ["dist_trsm"]


def dist_trsm(mesh: Mesh, form, B, axis: str = "x"):
    """Solve L X = B with the blocked TrsvForm, B (m, k) columns sharded.
    Returns X (m, k)."""
    n_dev = mesh.shape[axis]
    B = jnp.asarray(B)
    m, k = B.shape
    k_pad = -(-k // n_dev) * n_dev
    if k_pad != k:
        B = jnp.pad(B, ((0, 0), (0, k_pad - k)))
    if form.reversed_:
        B = B[::-1]
    m_pad = form.nblk * form.nb
    if m_pad != m:
        B = jnp.pad(B, ((0, m_pad - m), (0, 0)))
    Bs = put(B, mesh, P(None, axis))
    D = put(form.D, mesh, P())
    Lv = put(form.Lval, mesh, P())
    if form.kind == "win":
        from ..kernels.xla.trsv import trsv_blocked_win

        X = trsv_blocked_win(D, Lv, Bs, form.nb, m_pad, form.WL)
    else:
        from ..kernels.xla.trsv import trsv_blocked

        Li = put(form.Lind, mesh, P())
        X = trsv_blocked(D, Li, Lv, Bs, form.nb, m_pad)
    X = X[:m]
    if form.reversed_:
        X = X[::-1]
    return X[:, :k]
