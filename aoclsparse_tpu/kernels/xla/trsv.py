"""Blocked triangular solve kernels.

Executes the planner's TrsvForm (planner/triangular.py): a lax.scan over row
blocks; each step does a padded-ELL gather matvec against the already-solved
prefix of x and a dense (nb, nb) `triangular_solve` for the diagonal block.
This replaces the reference's loop-carried scalar sweep
(level2/aoclsparse_trsv_kt.cpp:65-...) with MXU/VPU-dense steps; scan length
is m/nb instead of m.

Works for single RHS (trsv) and multi-RHS (trsm: B is (m, k)) identically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["trsv_blocked"]


@partial(jax.jit, static_argnames=("nb", "m_pad", "WL"))
def trsv_blocked_win(D, Lwin, b, nb: int, m_pad: int, WL: int):
    """Banded variant: the left-of-diagonal part of each block is a dense
    (nb, WL) window ending at the block start, so the scan step reads the
    already-solved prefix with ONE dynamic slice (no gather — see the bwd
    SpMV rationale) and a dense matvec. b: (m_pad,) or (m_pad, k)."""
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    k = b.shape[1]
    nblk = D.shape[0]
    dtype = D.dtype
    b = b.astype(dtype)

    def step(xp, args):
        Dk, lwink, bk, kidx = args
        xwin = jax.lax.dynamic_slice(xp, (kidx * nb, 0), (WL, k))
        s = jnp.einsum("rw,wk->rk", lwink, xwin)
        xk = jax.lax.linalg.triangular_solve(
            Dk, bk - s, left_side=True, lower=True, unit_diagonal=False
        )
        xp = jax.lax.dynamic_update_slice(xp, xk, (WL + kidx * nb, 0))
        return xp, None

    xp0 = jnp.zeros((WL + m_pad, k), dtype=dtype)
    bs = b.reshape(nblk, nb, k)
    idx = jnp.arange(nblk)
    xp, _ = jax.lax.scan(step, xp0, (D, Lwin, bs, idx))
    x = xp[WL:]
    return x[:, 0] if squeeze else x


@partial(jax.jit, static_argnames=("nb", "m_pad"))
def trsv_blocked(D, Lind, Lval, b, nb: int, m_pad: int):
    """Solve L x = b with the blocked lower form. b: (m_pad,) or (m_pad, k)."""
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    k = b.shape[1]
    nblk = D.shape[0]
    dtype = D.dtype
    b = b.astype(dtype)

    def step(x, args):
        Dk, indk, valk, bk, kidx = args
        # left contribution: (nb, W) gather of solved entries
        xg = x[indk]  # (nb, W, k)
        s = jnp.einsum("rw,rwk->rk", valk, xg.astype(dtype))
        rhs = bk - s
        xk = jax.lax.linalg.triangular_solve(
            Dk, rhs, left_side=True, lower=True, unit_diagonal=False
        )
        x = jax.lax.dynamic_update_slice(x, xk, (kidx * nb, 0))
        return x, None

    x0 = jnp.zeros((m_pad, k), dtype=dtype)
    bs = b.reshape(nblk, nb, k)
    idx = jnp.arange(nblk)
    x, _ = jax.lax.scan(step, x0, (D, Lind, Lval, bs, idx))
    return x[:, 0] if squeeze else x
