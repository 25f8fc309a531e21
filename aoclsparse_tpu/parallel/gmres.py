"""Single-dispatch restarted GMRES over the banded-window operand.

Perf twin of the host-driven RCI GMRES (solvers/itsol.py): the full restarted
iteration — CGS Arnoldi, Givens rotations, restart cycles — compiles to ONE
XLA program (`while_loop` over cycles, `fori_loop` over the inner Krylov
steps), so a whole solve is a single dispatch. Under a Mesh the operand rows
shard and vectors replicate, like cg_bwd_jit.

Real dtypes (f32/f64); complex solves use the RCI layer. Residual tracked via
the rotated g vector (|g[j+1]|), exactly the reference's recurrence
(itsol_functions.hpp:1133-1160).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .placement import put

__all__ = ["gmres_bwd_jit", "dist_gmres_bwd"]


@partial(jax.jit, static_argnames=("R", "maxcycles", "W", "base8", "padL", "n_pad"))
def gmres_bwd_jit(
    win_val,
    b,
    x0,
    rtol,
    atol,
    R: int,
    maxcycles: int,
    W: int,
    base8: int,
    padL: int,
    n_pad: int,
    sp_ind=None,
    sp_rows=None,
    sp_val=None,
):
    """Returns (x, cycles, rnorm). R = restart length (static)."""
    mq = b.shape[0]
    dtype = b.dtype
    nblk = win_val.shape[0]
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny * 1e3, dtype)

    def matvec(v):
        vp = jnp.pad(v, (padL, n_pad - padL - mq))
        xr = vp.reshape(-1, 8)
        pats = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(xr, base8 + j, nblk, 0) for j in range(W // 8)],
            axis=1,
        )
        y = jnp.einsum("brw,bw->br", win_val, pats).reshape(-1)[:mq]
        if sp_ind is not None and sp_ind.shape[0]:
            y = y + jax.ops.segment_sum(
                sp_val * v[sp_ind], sp_rows, num_segments=mq, indices_are_sorted=True
            )
        return y

    bnorm = jnp.sqrt(jnp.sum(b * b))
    brtol = rtol * bnorm

    def inner(j, carry):
        V, H, g, c, s = carry
        w = matvec(V[j])
        hcol = V @ w  # (R+1,)
        mask = jnp.arange(R + 1) <= j
        hcol = jnp.where(mask, hcol, 0)
        w = w - hcol @ V
        hh = jnp.sqrt(jnp.sum(w * w))
        V = V.at[j + 1].set(w / jnp.maximum(hh, tiny))
        hcol = hcol.at[j + 1].set(hh)

        def rot_body(i, hc):
            r1, r2 = hc[i], hc[i + 1]
            pred = i < j
            hc = hc.at[i].set(jnp.where(pred, c[i] * r1 + s[i] * r2, r1))
            hc = hc.at[i + 1].set(jnp.where(pred, -s[i] * r1 + c[i] * r2, r2))
            return hc

        hcol = jax.lax.fori_loop(0, R, rot_body, hcol)
        denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
        denom = jnp.maximum(denom, tiny)
        cj = hcol[j] / denom
        sj = hcol[j + 1] / denom
        c = c.at[j].set(cj)
        s = s.at[j].set(sj)
        hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
        H = H.at[:, j].set(hcol)
        gj = g[j]
        g = g.at[j].set(cj * gj).at[j + 1].set(-sj * gj)
        return (V, H, g, c, s)

    def cycle_cond(state):
        x, ncyc, rnorm = state
        not_conv = jnp.logical_and(rnorm > atol, rnorm > brtol)
        return jnp.logical_and(not_conv, ncyc < maxcycles)

    def cycle_body(state):
        x, ncyc, rnorm = state
        r0 = b - matvec(x)
        beta = jnp.sqrt(jnp.sum(r0 * r0))
        V = jnp.zeros((R + 1, mq), dtype).at[0].set(r0 / jnp.maximum(beta, tiny))
        H = jnp.zeros((R + 1, R), dtype)
        g = jnp.zeros((R + 1,), dtype).at[0].set(beta)
        c = jnp.zeros((R,), dtype)
        s = jnp.zeros((R,), dtype)
        V, H, g, c, s = jax.lax.fori_loop(0, R, inner, (V, H, g, c, s))
        y = jax.lax.linalg.triangular_solve(
            H[:R, :R] + jnp.eye(R, dtype=dtype) * tiny, g[:R, None], left_side=True, lower=False
        )[:, 0]
        x = x + V[:R].T @ y
        return (x, ncyc + 1, jnp.abs(g[R]))

    r0 = b - matvec(x0)
    state = (x0, jnp.zeros((), jnp.int32), jnp.sqrt(jnp.sum(r0 * r0)))
    x, ncyc, rnorm = jax.lax.while_loop(cycle_cond, cycle_body, state)
    return x, ncyc, rnorm


def dist_gmres_bwd(
    mesh: Mesh,
    form,
    b,
    x0=None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    restart: int = 20,
    maxit: int = 150,
    axis: str = "x",
):
    """Distributed restarted GMRES over a planner bwd ExecForm (rows sharded,
    vectors replicated). Returns (x, iters≈cycles*restart, rnorm)."""
    n_dev = mesh.shape[axis]
    wv = form.bwd_val
    nblk = wv.shape[0]
    nblk_pad = -(-nblk // n_dev) * n_dev
    if nblk_pad != nblk:
        wv = jnp.pad(wv, ((0, nblk_pad - nblk), (0, 0), (0, 0)))
    m_pad = nblk_pad * 8
    n_pad = max(form.bwd_n_pad, 8 * (form.bwd_base8 + form.bwd_W // 8 - 1 + nblk_pad))
    wv = put(wv, mesh, P(axis, None, None))
    m = form.m
    b = jnp.asarray(b)
    bp = put(jnp.pad(b, (0, m_pad - b.shape[0])).astype(wv.dtype), mesh, P())
    x0p = (
        jnp.zeros((m_pad,), wv.dtype)
        if x0 is None
        else jnp.pad(jnp.asarray(x0), (0, m_pad - np.shape(x0)[0])).astype(wv.dtype)
    )
    x0p = put(x0p, mesh, P())
    maxcycles = max(1, -(-maxit // restart))
    sp_ind = sp_rows = sp_val = None
    if form.sp_ind is not None and form.sp_ind.shape[0]:
        sp_ind = put(form.sp_ind, mesh, P())
        sp_rows = put(form.sp_rows, mesh, P())
        sp_val = put(form.sp_val, mesh, P())
    x, ncyc, rnorm = gmres_bwd_jit(
        wv,
        bp,
        x0p,
        jnp.asarray(rtol, wv.dtype),
        jnp.asarray(atol, wv.dtype),
        restart,
        maxcycles,
        form.bwd_W,
        form.bwd_base8,
        form.bwd_padL,
        n_pad,
        sp_ind,
        sp_rows,
        sp_val,
    )
    return x[:m], int(ncyc) * restart, float(rnorm)
