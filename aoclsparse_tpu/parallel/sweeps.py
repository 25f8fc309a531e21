"""Distributed preconditioner sweeps: ILU0 apply and SymGS over a mesh.

SURVEY.md §5.8(iii) asks for sharded wavefront sweeps of TRSV **and** the
ILU0/SymGS smoothers. Both are compositions of the pieces that already run
distributed: the block-row pipelined triangular solve (trsv.py — operand
sharded, rolling window over the ring via ppermute) and the row-sharded
SpMV (spmv.py). The reference's smoothers are single-node sequential sweeps
(solvers/aoclsparse_ilu0.hpp, aoclsparse_symgs.hpp:88+); here the storage
and the per-block work scale with the mesh while the loop-carried
dependency rides the ring.

Real dtypes; general (op=none) and symmetric descriptors, like the fused
single-device sweeps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..core.descr import MatrixDescriptor
from ..core.types import (
    AoclSparseError,
    DiagType,
    MatrixType,
    Operation,
    Status,
)
from .spmv import dist_spmv_ell, shard_ell
from .trsv import dist_trsv_pipeline

__all__ = ["dist_ilu_apply", "dist_symgs"]


def _tri(fill, diag):
    return MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill, diag_type=diag)


def _pipeline_solve(mesh, form, rhs, axis):
    """dist_trsv_pipeline with the same reversal/padding contract as the
    local _apply_form (solvers/ilu.py). The rhs stays a device array — a
    host round-trip here would sync the tunnel per sweep step."""
    x = dist_trsv_pipeline(mesh, form, rhs, axis=axis)
    return jnp.asarray(x)


def dist_ilu_apply(mesh: Mesh, A, b, axis: str = "x", engine: str = "pipeline"):
    """x = U^{-1} L^{-1} b over the cached ILU0 factors. engine="pipeline"
    (default) runs both solves as block-row ring pipelines (banded
    operands); engine="level" shards the wavefront LevelForms instead
    (parallel/trsv.py dist_trsv_levels — one all_gather per dependency
    level, the shallow-DAG schedule)."""
    from ..solvers.ilu import ilu0_factorize

    if b is None:
        raise AoclSparseError(Status.invalid_pointer, "null b")
    st = A.ilu_state if getattr(A, "ilu_state", None) is not None else ilu0_factorize(A)
    b = jnp.asarray(b).astype(A.dtype)
    if engine == "level":
        from ..solvers.ilu import _ilu_level_forms
        from .trsv import dist_trsv_levels

        l_lvl, u_lvl = _ilu_level_forms(st)
        y = dist_trsv_levels(mesh, l_lvl, b, axis=axis)
        return dist_trsv_levels(mesh, u_lvl, y, axis=axis)
    if engine != "pipeline":
        raise AoclSparseError(Status.invalid_value, f"unknown engine '{engine}'")
    y = _pipeline_solve(mesh, st.l_form, b, axis)[: A.shape[0]]
    return _pipeline_solve(mesh, st.u_form, y, axis)[: A.shape[0]]


def dist_symgs(
    mesh: Mesh,
    A,
    descr: MatrixDescriptor,
    alpha,
    b,
    x0=None,
    axis: str = "x",
    engine: str = "pipeline",
):
    """One distributed symmetric Gauss-Seidel sweep (the mesh rebuild of
    aoclsparse_?symgs, solvers/aoclsparse_symgs.hpp:88+):

        1. q = alpha*U_s x0 ; (L+D) x1 = b - q     [SpMV + pipelined solve]
        2. r = L_s x1 ;       (U+D) x  = b - r     [SpMV + pipelined solve]

    The strict-triangle SpMVs run row-sharded (dist_spmv_ell); the
    triangular solves run as block-row ring pipelines (engine="pipeline")
    or sharded level wavefronts (engine="level" — shallow circuit-class
    DAGs, parallel/trsv.py dist_trsv_levels). Returns x."""
    from ..planner.plan import get_plan
    from ..planner.triangular import trsv_form_for

    if b is None:
        raise AoclSparseError(Status.invalid_pointer, "null b")
    mtype = MatrixType(descr.type)
    if mtype not in (MatrixType.general, MatrixType.symmetric):
        raise AoclSparseError(Status.not_implemented, f"dist_symgs: type {mtype.name}")
    m, n = A.shape
    if m != n:
        raise AoclSparseError(Status.invalid_size, "symgs requires a square matrix")
    if jnp.iscomplexobj(jnp.zeros((), A.dtype)):
        raise AoclSparseError(Status.not_implemented, "dist_symgs: real dtypes")

    from ..solvers.symgs import lu_view_selection

    l_fm, l_op, u_fm, u_op = lu_view_selection(mtype, descr, Operation.none)

    plan = get_plan(A)
    # cache the sharded operands + solve forms on the plan: re-uploading the
    # full ELL arrays through the contended tunnel per sweep would dominate
    # an outer iteration (the single-device sweep caches its whole fused
    # program for the same reason, solvers/symgs.py _symgs_fused)
    if engine not in ("pipeline", "level"):
        raise AoclSparseError(Status.invalid_value, f"unknown engine '{engine}'")
    ckey = ("dist_symgs", mtype, descr.fill_mode, axis, mesh.shape[axis], engine)
    cache = getattr(plan, "_dist_sweep_cache", None)
    if cache is None:
        cache = plan._dist_sweep_cache = {}
    ops = cache.get(ckey)
    if ops is None:
        tri_l = _tri(l_fm, DiagType.non_unit)
        tri_u = _tri(u_fm, DiagType.non_unit)
        tri_ls = _tri(l_fm, DiagType.zero)
        tri_us = _tri(u_fm, DiagType.zero)

        def _sharded_mv(descr_s, op_s):
            form = plan.exec_form_for(descr_s, op_s, kind="ell", dtype=A.dtype)
            ind_s, val_s, m_pad = shard_ell(mesh, form.ell_ind, form.ell_val)

            def run(x):
                xp = jnp.pad(jnp.asarray(x), (0, max(0, m_pad - np.shape(x)[0])))
                return dist_spmv_ell(mesh, ind_s, val_s, xp)[:m]

            return run

        if engine == "level":
            from ..planner.triangular import trsv_level_form_for

            ops = (
                _sharded_mv(tri_us, u_op),
                _sharded_mv(tri_ls, l_op),
                trsv_level_form_for(plan, tri_l, l_op),
                trsv_level_form_for(plan, tri_u, u_op),
            )
        else:
            ops = (
                _sharded_mv(tri_us, u_op),
                _sharded_mv(tri_ls, l_op),
                trsv_form_for(plan, tri_l, l_op),
                trsv_form_for(plan, tri_u, u_op),
            )
        cache[ckey] = ops
    mv_us, mv_ls, form_l, form_u = ops

    b = jnp.asarray(b).astype(A.dtype)
    x0 = jnp.zeros((m,), A.dtype) if x0 is None else jnp.asarray(x0).astype(A.dtype)
    alpha_c = jnp.asarray(alpha, A.dtype)

    if engine == "level":
        from .trsv import dist_trsv_levels

        q = mv_us(x0)
        x1 = dist_trsv_levels(mesh, form_l, b - alpha_c * q, axis=axis)[:m]
        r = mv_ls(x1)
        return dist_trsv_levels(mesh, form_u, b - r, axis=axis)[:m]
    q = mv_us(x0)  # U_s x0 (alpha applied below, symgs.hpp step 1)
    x1 = _pipeline_solve(mesh, form_l, b - alpha_c * q, axis)[:m]
    r = mv_ls(x1)
    x = _pipeline_solve(mesh, form_u, b - r, axis)[:m]
    return x
