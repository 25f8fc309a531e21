"""Fused single-dispatch preconditioned Krylov solvers.

The host-driven RCI steppers (solvers/itsol.py) mirror the reference's
reverse-communication protocol; the reference's FORWARD interface fuses the
operator and preconditioner into one loop (aoclsparse_cg_solve,
itsol_functions.hpp:1352; gmres :1493). These are the TPU twins of that
forward path: the whole preconditioned solve — SpMV through the planner's
execution form, ILU0/SymGS application as blocked scans, vector updates,
convergence test — is ONE compiled XLA program (`lax.while_loop`), so a
full Krylov solve costs one dispatch through the remote tunnel instead of
one per vector op (~ms each here).

Iteration semantics match the reference task machines (same update order,
same convergence tests), so iteration counts are comparable with the host
RCI path — pinned by tests/test_fused_solvers.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descr import MatrixDescriptor
from ..core.matrix import SparseMatrix
from ..core.types import (
    AoclSparseError,
    DiagType,
    FillMode,
    MatrixType,
    Operation,
    Status,
)
from ..ops.level2.mv import _run_exec_form
from ..planner.plan import get_plan
from ..planner.triangular import trsv_form_for

__all__ = ["pcg_solve", "pgmres_solve", "make_cg_operator", "make_gmres_operator"]

GENERAL = MatrixDescriptor()


def _pad_solve(form, r):
    """Traceable TrsvForm application on a 1-D rhs (see ilu._apply_form)."""
    m_pad = form.nblk * form.nb
    r2 = r[:, None]
    if form.reversed_:
        r2 = r2[::-1]
    if m_pad != form.m:
        r2 = jnp.pad(r2, ((0, m_pad - form.m), (0, 0)))
    x = form.solve(r2)[: form.m]
    if form.reversed_:
        x = x[::-1]
    return x[:, 0]


def _tri(fill, diag):
    return MatrixDescriptor(type=MatrixType.triangular, fill_mode=fill, diag_type=diag)


def _make_apply(A: SparseMatrix, precond: Optional[str]):
    """Build a traceable z = M^{-1} r for the requested preconditioner.

    ILU0: two blocked scans over the cached factors (reference L/U
    substitution, ilu0.hpp:115-162). SGS: the zero-initial-guess symmetric
    GS sweep (symgs_ref steps with x0=0, solvers/aoclsparse_symgs.hpp:88):
    x1 = (L+D)^{-1} b ;  z = (U+D)^{-1} (b - L_s x1).
    """
    if precond is None:
        return None
    if precond == "ilu0":
        from .ilu import _ilu_level_forms, ilu0_factorize

        st = ilu0_factorize(A)
        if st.l_form is None:
            # blocked windows refused (oversized): level-scheduled sweeps
            l_lvl, u_lvl = _ilu_level_forms(st)

            def apply(r):
                return u_lvl.solve(l_lvl.solve(r))

            return apply

        def apply(r):
            return _pad_solve(st.u_form, _pad_solve(st.l_form, r))

        return apply
    if precond == "sgs":
        plan = get_plan(A)
        l_form = trsv_form_for(plan, _tri(FillMode.lower, DiagType.non_unit), Operation.none)
        u_form = trsv_form_for(plan, _tri(FillMode.upper, DiagType.non_unit), Operation.none)
        ls_eff_form = plan.exec_form_for(
            _tri(FillMode.lower, DiagType.zero), Operation.none, dtype=A.dtype
        )

        def apply(r):
            x1 = _pad_solve(l_form, r)
            t = r - _run_exec_form(ls_eff_form, x1, None)
            return _pad_solve(u_form, t)

        return apply
    raise AoclSparseError(Status.invalid_value, f"unknown preconditioner '{precond}'")


def _pallas_solve_operands(form):
    """Concrete (dinvT, lwT) operands of the Pallas sequential win-solve
    for a win-kind TrsvForm, built once per form. These are returned so the
    caller can pass them as JIT ARGUMENTS: a jitted loop that closes over
    them ships them as HLO constants in the remote-compile request, which
    breaks above ~200 MB (HTTP 413 — the r4 ILU probe's first apply-loop
    attempt) and bloats every compile below it."""
    cached = getattr(form, "_jitarg_ops", None)
    if cached is not None:
        return cached
    from ..kernels.xla.trsv import invert_diag_blocks

    with jax.ensure_compile_time_eval():
        nblk_pad = -(-form.nblk // 8) * 8
        dinvT = jnp.swapaxes(invert_diag_blocks(form.D), 1, 2)
        lwT = jnp.swapaxes(form.Lval, 1, 2)
        if nblk_pad != form.nblk:
            eye = jnp.broadcast_to(
                jnp.eye(form.nb, dtype=dinvT.dtype),
                (nblk_pad - form.nblk, form.nb, form.nb),
            )
            dinvT = jnp.concatenate([dinvT, eye])
            lwT = jnp.concatenate(
                [lwT, jnp.zeros((nblk_pad - form.nblk, form.WL, form.nb), lwT.dtype)]
            )
    form._jitarg_ops = (dinvT, lwT)
    return form._jitarg_ops


def _pallas_winsolve_ok(form, dtype) -> bool:
    """Conditions under which the Pallas sequential-grid win solve serves a
    TrsvForm (mirrors TrsvForm.solve's own gate)."""
    from ..planner.triangular import _pallas_solve_dtype_ok

    return (
        form is not None
        and form.kind == "win"
        and form.nb % 128 == 0
        and form.WL % 8 == 0
        and form.WL <= form.nb
        and _pallas_solve_dtype_ok(np.dtype(dtype))
    )


from functools import partial as _partial  # noqa: E402


@_partial(
    jax.jit,
    static_argnames=(
        "maxit", "W", "padL", "start", "TM", "nbL", "WLL", "nbU", "WLU", "m", "interpret",
    ),
)
def _pcg_bandv_ilu0_jit(
    vt4, dLT, lwLT, dUT, lwUT, b, x0, rtol, atol, sp_val, sp_ind, sp_rows,
    maxit: int, W: int, padL: int, start: int, TM: int,
    nbL: int, WLL: int, nbU: int, WLU: int, m: int, interpret: bool,
):
    """Fused ILU0-preconditioned CG with EVERY large operand as a jit
    argument: band matvec = the headline Pallas bandv kernel, M^-1 = the two
    Pallas sequential-grid win solves over the pre-inverted factor blocks
    (U applied on reversed indices). One compiled program per solve —
    the argument-passing twin of parallel.cg.cg_bandv_jit for the
    preconditioned case (VERDICT r3 item 4: pcg_ilu0 iteration cost)."""
    from ..kernels.pallas.spmv import pallas_spmv_band_v
    from ..kernels.pallas.trsv import pallas_trsv_win_inv8

    mpadL = dLT.shape[0] * nbL
    mpadU = dUT.shape[0] * nbU

    def matvec(v):
        xe = jnp.pad(v, (padL, 0))
        y = pallas_spmv_band_v(vt4, xe, W, start, TM=TM, interpret=interpret)[:m]
        y = y.astype(v.dtype)
        if sp_ind is not None and sp_ind.shape[0]:
            y = y + jax.ops.segment_sum(
                sp_val * v[sp_ind], sp_rows, num_segments=m, indices_are_sorted=True
            )
        return y

    def apply(r):
        zf = jnp.pad(r, (0, mpadL - m))
        z = pallas_trsv_win_inv8(dLT, lwLT, zf, nbL, WLL, interpret=interpret)[:m]
        uf = jnp.pad(z[::-1], (0, mpadU - m))
        u = pallas_trsv_win_inv8(dUT, lwUT, uf, nbU, WLU, interpret=interpret)[:m]
        return u[::-1]

    run = _build_cg_run(matvec, apply, int(maxit))
    return run(b, x0, rtol, atol)


def _get_cache(A: SparseMatrix):
    plan = get_plan(A)
    if not hasattr(plan, "_fused_cache"):
        plan._fused_cache = {}
    return plan._fused_cache


def _gen_pspace(form):
    """(matvec_p, to_p, from_p) for PERMUTED-SPACE Krylov iteration on a
    gen-composite operand (kernels/xla/spmv.py spmv_gen_bandv_p): the gen
    form's per-call x/y element permutes are two O(m) gathers (~1.7 ms
    each at m=262k on this TPU) that dominate the per-iteration time;
    a symmetric permutation preserves norms and Krylov iterates map
    1:1, so the loop runs on xp = P x and only the boundary pays the
    gathers. Returns None when the form does not qualify."""
    if form.kind != "gen" or not getattr(form, "gen_bandt", False):
        return None
    import os

    from ..core.context import get_context
    from ..kernels.xla.spmv import spmv_gen_bandv_p
    from ..ops.level2.mv import _zero_aux, _zero_operands

    ctx = get_context()
    from ..kernels.pallas.spmv import bandv_tm

    TM = bandv_tm(form.bwd_W) if ctx.is_tpu else max(128, -(-form.bwd_W // 8) * 8)
    from ..ops.level2.mv import _mixed_enabled

    mixed = _mixed_enabled(form, np.float32)
    vt4 = form.bandt_vertical(TM=TM, bf16=mixed)
    src, inv, hub_cols_p = form.gen_perm_maps()
    has_spill = form.sp_ind is not None and bool(form.sp_ind.shape[0])
    has_hub = form.hub_cols is not None and bool(form.hub_cols.shape[0])
    has_hubrow = form.hubr_rows is not None and bool(form.hubr_rows.shape[0])
    dt = np.dtype(np.float32)
    zi, zv = _zero_operands(dt)
    zm, _zb = _zero_aux(dt)
    W = vt4.shape[0] // 8
    m_pad = form.gen_m_pad
    m = form.m

    def to_p(v):
        return jnp.pad(v, (0, m_pad - v.shape[0]))[src]

    def from_p(vp):
        return vp[inv][:m]

    from ..ops.level2.mv import _spill_route_on

    sroute_ops = sroute_statics = None
    if has_spill and _spill_route_on(form, ctx.is_tpu):
        sr = form.spill_route()
        sroute_ops, sroute_statics = sr.ops(), sr.statics()

    def matvec_p(xp):
        return spmv_gen_bandv_p(
            vt4,
            xp,
            form.hub_slab if has_hub else zm,
            hub_cols_p if has_hub else zi,
            form.hubr_slab if has_hubrow else zm,
            form.hubr_rows if has_hubrow else zi,
            form.sp_val if has_spill else zv,
            form.sp_ind if has_spill else zi,
            form.sp_rows if has_spill else zi,
            W=W,
            padL=form.bwd_padL,
            start=form.bandt_start,
            TM=TM,
            m_pad=m_pad,
            interpret=not ctx.is_tpu,
            has_hub=has_hub,
            has_hubrow=has_hubrow,
            has_spill=has_spill,
            sproute=sroute_ops,
            sproute_statics=sroute_statics,
        )

    return matvec_p, to_p, from_p


def _build_cg_run(matvec, apply, maxit: int):
    """CG while_loop body over an arbitrary traceable `matvec` (and optional
    traceable preconditioner `apply`). Shared by the matrix-handle path
    (pcg_solve) and the matrix-free operator path (make_cg_operator)."""

    def run(b, x0, rtol_c, atol_c):
        # norms are real; dots stay UNCONJUGATED for complex dtypes
        # (the reference CG's complex-symmetric semantics,
        # itsol_functions.hpp:665-832 via cblas dotu)
        def nrm(v):
            return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2).real)

        if apply is None and not jnp.iscomplexobj(b):
            # real unpreconditioned CG: rz = r.r doubles as ||r||^2, so the
            # loop runs on 2 reductions/iteration instead of 3 — each
            # reduction is a sequential barrier inside the while_loop
            # (same update order; the reference's RES_NORM is sqrt(rz))
            bnorm = nrm(b)
            brtol = rtol_c * bnorm
            r0 = matvec(x0) - b
            rr0 = jnp.sum(r0 * r0)

            def cond2(state):
                x, r, p, rr_prev, rr, k = state
                rnorm = jnp.sqrt(rr)
                not_conv = jnp.logical_and(rnorm > atol_c, rnorm > brtol)
                return jnp.logical_and(not_conv, k < maxit)

            def body2(state):
                x, r, p, rr_prev, rr, k = state
                beta = jnp.where(k == 0, jnp.zeros_like(rr), rr / rr_prev)
                p = beta * p - r
                q = matvec(p)
                alpha = rr / jnp.sum(p * q)
                x = x + alpha * p
                r = r + alpha * q
                return (x, r, p, rr, jnp.sum(r * r), k + 1)

            st2 = (
                x0,
                r0,
                jnp.zeros_like(x0),
                jnp.ones((), b.dtype),
                rr0,
                jnp.zeros((), jnp.int32),
            )
            x, r, p, rr_prev, rr, k = jax.lax.while_loop(cond2, body2, st2)
            return x, k, jnp.sqrt(rr)

        bnorm = nrm(b)
        brtol = rtol_c * bnorm
        r0 = matvec(x0) - b
        rn0 = nrm(r0)

        def cond(state):
            x, r, p, rz, k, rnorm = state
            not_conv = jnp.logical_and(rnorm > atol_c, rnorm > brtol)
            return jnp.logical_and(not_conv, k < maxit)

        def body(state):
            x, r, p, rz, k, rnorm = state
            z = apply(r) if apply is not None else r
            rz_new = jnp.sum(r * z)
            beta = jnp.where(k == 0, jnp.zeros_like(rz), rz_new / rz)
            p = beta * p - z
            q = matvec(p)
            alpha = rz_new / jnp.sum(p * q)
            x = x + alpha * p
            r = r + alpha * q
            return (x, r, p, rz_new, k + 1, nrm(r))

        st = (x0, r0, jnp.zeros_like(x0), jnp.ones((), b.dtype), jnp.zeros((), jnp.int32), rn0)
        x, r, p, rz, k, rnorm = jax.lax.while_loop(cond, body, st)
        return x, k, rnorm

    return run


def make_cg_operator(matvec, precond=None, maxit: int = 500):
    """Matrix-free fused CG: `matvec` (and optional `precond`) are arbitrary
    jax-traceable callables — the functional analog of driving the RCI loop
    with a user operator (SURVEY.md §7; the reference only reaches
    matrix-free operation through its RCI interface). Returns a reusable
    `solve(b, x0=None, rtol=1e-8, atol=0.0) -> (x, iters, rnorm)` closure
    whose whole solve is ONE compiled dispatch."""
    run = jax.jit(_build_cg_run(matvec, precond, int(maxit)))

    def solve(b, x0=None, rtol: float = 1e-8, atol: float = 0.0):
        b = jnp.asarray(b)
        x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0).astype(b.dtype)
        rdt = jnp.zeros((), b.dtype).real.dtype
        x, k, rnorm = run(b, x0, jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt))
        return x, int(k), float(rnorm)

    return solve


def pcg_solve(
    A: SparseMatrix,
    b,
    x0=None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxit: int = 500,
    precond: Optional[str] = None,
    descr: MatrixDescriptor = GENERAL,
) -> Tuple[jnp.ndarray, int, float]:
    """Preconditioned CG as one compiled program. Same update order as the
    reference CG task machine (itsol_functions.hpp:619-870): r = Ax - b,
    z = M^{-1} r, p = beta*p - z, alpha = rz/pq; convergence on ||r||_2
    against max(atol, rtol*||b||). Returns (x, iterations, final ||r||)."""
    if A.shape[0] != A.shape[1]:
        raise AoclSparseError(Status.invalid_size, "pcg requires square A")
    m = A.shape[0]
    b = jnp.asarray(b).astype(A.dtype)
    if b.shape != (m,):
        raise AoclSparseError(Status.invalid_size, f"b must be ({m},)")
    x0 = jnp.zeros((m,), A.dtype) if x0 is None else jnp.asarray(x0).astype(A.dtype)
    plan = get_plan(A)
    form = plan.exec_form_for(descr, Operation.none, dtype=A.dtype)
    apply = _make_apply(A, precond)
    rdt = jnp.zeros((), b.dtype).real.dtype  # tolerance dtype: real part
    cache = _get_cache(A)
    # permuted-space iteration for gen-composite operands (unpreconditioned
    # only — the cached ILU/SGS factors live in original index space): the
    # loop avoids the per-iteration O(m) permute gathers; boundary pays
    # them once. Norm/iterate mapping is exact (symmetric permutation).
    pspace = _gen_pspace(form) if precond is None else None
    if pspace is not None:
        matvec_p, to_p, from_p = pspace
        key = ("pcg-p", int(maxit), descr.type, descr.fill_mode)
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(_build_cg_run(matvec_p, None, int(maxit)))
            cache[key] = fn
        xp, k, rnorm = fn(to_p(b), to_p(x0), jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt))
        return from_p(xp), int(k), float(rnorm)
    # argument-passed fused ILU0 path: band matvec + Pallas win solves with
    # all large operands as jit arguments (closures become HLO constants in
    # the remote compile request — HTTP 413 above ~200 MB, slow compiles
    # below it). Conditions mirror TrsvForm.solve's Pallas gate.
    if precond == "ilu0" and form.kind == "bandt":
        from ..core.context import get_context

        st = A.ilu_state
        ctx = get_context()
        if (
            (ctx.is_tpu or ctx.pallas_ok)
            and st.l_form is not None
            and st.u_form is not None
            and _pallas_winsolve_ok(st.l_form, A.dtype)
            and _pallas_winsolve_ok(st.u_form, A.dtype)
            and not st.l_form.reversed_
            and st.u_form.reversed_
        ):
            from ..kernels.pallas.spmv import bandv_tm

            TM = bandv_tm(form.bwd_W)
            vt4 = form.bandt_vertical(TM=TM)
            dLT, lwLT = _pallas_solve_operands(st.l_form)
            dUT, lwUT = _pallas_solve_operands(st.u_form)
            has_spill = form.sp_ind is not None and bool(form.sp_ind.shape[0])
            x, k, rnorm = _pcg_bandv_ilu0_jit(
                vt4, dLT, lwLT, dUT, lwUT, b, x0,
                jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt),
                form.sp_val if has_spill else None,
                form.sp_ind if has_spill else None,
                form.sp_rows if has_spill else None,
                maxit=int(maxit), W=vt4.shape[0] // 8, padL=form.bwd_padL,
                start=form.bandt_start, TM=TM,
                nbL=st.l_form.nb, WLL=st.l_form.WL,
                nbU=st.u_form.nb, WLU=st.u_form.WL,
                m=m, interpret=not ctx.is_tpu,
            )
            return x, int(k), float(rnorm)
    key = ("pcg", precond, int(maxit), descr.type, descr.fill_mode)
    ent = cache.get(key)
    if ent is None:

        def matvec(v):
            return _run_exec_form(form, v, None)

        # trace ONCE and pass the captured operands (exec form arrays, ILU
        # factor forms) as jit ARGUMENTS: closed-over they become HLO
        # constants and the remote compile request dies on HTTP 413 past
        # ~200 MB (ldoor diag form: 532 MB dia_val + GB-scale ILU windows)
        run = _build_cg_run(matvec, apply, int(maxit))
        closed = jax.make_jaxpr(run)(
            b, x0, jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt)
        )
        consts = [jnp.asarray(c) for c in closed.consts]

        @jax.jit
        def fn(b_, x0_, rt_, at_, *cs):
            return jax.core.eval_jaxpr(closed.jaxpr, list(cs), b_, x0_, rt_, at_)

        ent = (fn, consts)
        cache[key] = ent
    fn, consts = ent
    x, k, rnorm = fn(
        b, x0, jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt), *consts
    )
    return x, int(k), float(rnorm)


def _build_gmres_run(matvec, apply, mr: int, maxit: int):
    """Restarted-GMRES while_loop body over arbitrary traceable `matvec` /
    right preconditioner `apply`. Shared by pgmres_solve and
    make_gmres_operator."""

    def op(v):
        return matvec(apply(v)) if apply is not None else matvec(v)

    def run(b, x0, rtol_c, atol_c):
        # complex-generic: norms are real, CGS dots are CONJUGATED
        # (<v_i, w> = v_i^H w), and the Givens rotations use the complex
        # form [c, s; -conj(s), c] with real c (LAPACK ?lartg semantics,
        # the reference's rotation source, itsol_functions.hpp:1133-1152).
        # For real dtypes every conj is a no-op and c/s reduce to the
        # reference's sign convention (r = sign(f)*d).
        dt = b.dtype
        rdt = jnp.zeros((), dt).real.dtype

        def nrm(v):
            return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2).real).astype(rdt)

        bnorm = nrm(b)
        brtol = rtol_c * bnorm
        tol = jnp.maximum(atol_c, brtol)

        def cycle(x):
            """One restart cycle; returns (x_new, beta_end, n_inner)."""
            r0 = b - matvec(x)
            beta = nrm(r0)
            safe_beta = jnp.where(beta > 0, beta, jnp.ones((), rdt))
            V0 = jnp.zeros((mr + 1, b.shape[0]), dt).at[0].set(r0 / safe_beta)
            g0 = jnp.zeros((mr + 1,), dt).at[0].set(beta.astype(dt))
            H0 = jnp.zeros((mr + 1, mr), dt)
            c0 = jnp.zeros((mr,), rdt)
            s0 = jnp.zeros((mr,), dt)

            def arnoldi(carry, j):
                V, H, g, c, s, res, active = carry
                w = op(V[j])
                # CGS against all basis vectors, masked to i <= j
                hc = jnp.conj(V) @ w  # (mr+1,)
                mask = jnp.arange(mr + 1) <= j
                hc = jnp.where(mask, hc, jnp.zeros((), dt))
                w = w - hc @ V
                hh = nrm(w)
                safe_hh = jnp.where(hh > 0, hh, jnp.ones((), rdt))
                V = V.at[j + 1].set(jnp.where(active, w / safe_hh, V[j + 1]))
                hcol = hc.at[j + 1].set(hh.astype(dt))

                # previous Givens rotations, masked scan over i < j
                def rot(hcol, i):
                    r1 = hcol[i]
                    r2 = hcol[i + 1]
                    nr1 = c[i] * r1 + s[i] * r2
                    nr2 = -jnp.conj(s[i]) * r1 + c[i] * r2
                    apply_i = i < j
                    hcol = hcol.at[i].set(jnp.where(apply_i, nr1, r1))
                    hcol = hcol.at[i + 1].set(jnp.where(apply_i, nr2, r2))
                    return hcol, None

                hcol, _ = jax.lax.scan(rot, hcol, jnp.arange(mr))
                f, gg = hcol[j], hcol[j + 1]
                af = jnp.abs(f).real.astype(rdt)
                d = jnp.sqrt(af * af + (jnp.abs(gg) ** 2).real).astype(rdt)
                safe_d = jnp.where(d > 0, d, jnp.ones((), rdt))
                safe_af = jnp.where(af > 0, af, jnp.ones((), rdt))
                # phase = f/|f| (1 when f = 0); real dtype: sign(f)
                phase = jnp.where(af > 0, f / safe_af.astype(dt), jnp.ones((), dt))
                cj = jnp.where(d > 0, af / safe_d, jnp.ones((), rdt))
                sj = jnp.where(
                    d > 0,
                    phase * jnp.conj(gg) / safe_d.astype(dt),
                    jnp.zeros((), dt),
                )
                rj = jnp.where(d > 0, phase * d.astype(dt), f)
                hcol = hcol.at[j].set(rj).at[j + 1].set(jnp.zeros((), dt))
                H = H.at[:, j].set(jnp.where(active, hcol, H[:, j]))
                c = c.at[j].set(jnp.where(active, cj, c[j]))
                s = s.at[j].set(jnp.where(active, sj, s[j]))
                gj = g[j]
                g = g.at[j].set(jnp.where(active, cj * gj, g[j]))
                g = g.at[j + 1].set(jnp.where(active, -jnp.conj(sj) * gj, g[j + 1]))
                res_new = jnp.where(active, jnp.abs(g[j + 1]).real.astype(rdt), res)
                took = active
                active = jnp.logical_and(active, res_new > tol)
                return (V, H, g, c, s, res_new, active), took

            init = (V0, H0, g0, c0, s0, beta, beta > tol)
            (V, H, g, c, s, res, _), took = jax.lax.scan(
                arnoldi, init, jnp.arange(mr)
            )
            n_inner = jnp.sum(took.astype(jnp.int32)).astype(jnp.int32)

            # back-substitution on the rotated H (masked to j < n_inner)
            def backsub(y, jj):
                j = mr - 1 - jj
                active_j = j < n_inner
                acc = g[j] - H[j] @ y
                diag = jnp.where(jnp.abs(H[j, j]) > 0, H[j, j], jnp.ones((), dt))
                y = y.at[j].set(jnp.where(active_j, acc / diag, 0.0))
                return y, None

            y, _ = jax.lax.scan(backsub, jnp.zeros((mr,), dt), jnp.arange(mr))
            upd = y @ V[:mr]
            upd = apply(upd) if apply is not None else upd
            return x + upd, res, n_inner

        def cond(state):
            x, res, it, cyc = state
            return jnp.logical_and(res > tol, it < maxit)

        def body(state):
            x, res, it, cyc = state
            x, res, n_inner = cycle(x)
            return (x, res, (it + n_inner).astype(jnp.int32), cyc + 1)

        r_init = b - matvec(x0)
        res0 = nrm(r_init)
        x, res, it, cyc = jax.lax.while_loop(
            cond, body, (x0, res0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        )
        return x, it, res

    return run


def make_gmres_operator(matvec, precond=None, maxit: int = 500, restart: int = 20):
    """Matrix-free fused restarted GMRES (right-preconditioned): `matvec`
    and optional `precond` are jax-traceable callables — the functional
    analog of the RCI operator protocol (SURVEY.md §7). Returns a reusable
    `solve(b, x0=None, rtol=1e-8, atol=0.0) -> (x, iters, rnorm)` closure;
    the whole solve is ONE compiled dispatch."""
    run = jax.jit(_build_gmres_run(matvec, precond, int(restart), int(maxit)))

    def solve(b, x0=None, rtol: float = 1e-8, atol: float = 0.0):
        b = jnp.asarray(b)
        x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0).astype(b.dtype)
        rdt = jnp.zeros((), b.dtype).real.dtype
        x, k, rnorm = run(b, x0, jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt))
        return x, int(k), float(rnorm)

    return solve


def pgmres_solve(
    A: SparseMatrix,
    b,
    x0=None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxit: int = 500,
    restart: int = 20,
    precond: Optional[str] = None,
    descr: MatrixDescriptor = GENERAL,
) -> Tuple[jnp.ndarray, int, float]:
    """Right-preconditioned restarted GMRES as one compiled program.

    Mirrors the reference engine (CGS orthogonalization + Givens rotations,
    itsol_functions.hpp:893-1290) with the Krylov cycle as a `lax.scan` of
    fixed length `restart` (masked past convergence) inside a while_loop
    over restarts. Right preconditioning keeps the true residual in the
    recurrence: x += M^{-1}(V y) applies M once per cycle.
    Returns (x, inner iterations, final residual norm)."""
    if A.shape[0] != A.shape[1]:
        raise AoclSparseError(Status.invalid_size, "pgmres requires square A")
    m = A.shape[0]
    b = jnp.asarray(b).astype(A.dtype)
    if b.shape != (m,):
        raise AoclSparseError(Status.invalid_size, f"b must be ({m},)")
    x0 = jnp.zeros((m,), A.dtype) if x0 is None else jnp.asarray(x0).astype(A.dtype)
    mr = int(restart)
    plan = get_plan(A)
    form = plan.exec_form_for(descr, Operation.none, dtype=A.dtype)
    apply = _make_apply(A, precond)
    cache = _get_cache(A)
    rdt = jnp.zeros((), b.dtype).real.dtype  # tolerance dtype: real part
    # permuted-space iteration for gen operands (see pcg_solve)
    pspace = _gen_pspace(form) if precond is None else None
    if pspace is not None:
        matvec_p, to_p, from_p = pspace
        key = ("pgmres-p", int(maxit), mr, descr.type, descr.fill_mode)
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(_build_gmres_run(matvec_p, None, mr, int(maxit)))
            cache[key] = fn
        xp, k, rnorm = fn(to_p(b), to_p(x0), jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt))
        return from_p(xp), int(k), float(rnorm)
    key = ("pgmres", precond, int(maxit), mr, descr.type, descr.fill_mode)
    ent = cache.get(key)
    if ent is None:

        def matvec(v):
            return _run_exec_form(form, v, None)

        # operands as jit arguments, not closure constants (see pcg_solve)
        run = _build_gmres_run(matvec, apply, mr, int(maxit))
        closed = jax.make_jaxpr(run)(
            b, x0, jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt)
        )
        consts = [jnp.asarray(c) for c in closed.consts]

        @jax.jit
        def fn(b_, x0_, rt_, at_, *cs):
            return jax.core.eval_jaxpr(closed.jaxpr, list(cs), b_, x0_, rt_, at_)

        ent = (fn, consts)
        cache[key] = ent
    fn, consts = ent
    x, k, rnorm = fn(
        b, x0, jnp.asarray(rtol, rdt), jnp.asarray(atol, rdt), *consts
    )
    return x, int(k), float(rnorm)
