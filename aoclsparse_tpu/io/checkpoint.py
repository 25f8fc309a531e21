"""Checkpoint/resume for matrix handles and factorizations.

The reference has no file checkpointing (SURVEY.md §5.4) — its analogs are
the staged-computation idioms (two-stage SpGEMM, one-time ILU flag, RCI
state owned by the caller). For a framework intended for long-running
distributed solves, we add the real thing: save/load of a handle's CSR data
and the ILU0 factor working values to a .npz, so an interrupted solve resumes
without re-planning or re-factorizing.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.formats import CSR
from ..core.matrix import SparseMatrix
from ..core.types import AoclSparseError, FormatType, IndexBase, Status

__all__ = ["save_matrix", "load_matrix"]

_FORMAT_VERSION = 1


def save_matrix(path, h: SparseMatrix) -> None:
    """Serialize a handle (CSR data + cached ILU0 values) to .npz."""
    if h is None:
        raise AoclSparseError(Status.invalid_pointer, "null matrix")
    # save the clean (sorted) order so a cached ILU factor re-aligns on load
    from ..planner.plan import get_plan

    clean = get_plan(h).clean
    payload = {
        "format_version": np.int64(_FORMAT_VERSION),
        "m": np.int64(clean.m),
        "n": np.int64(clean.n),
        "ptr": np.asarray(clean.ptr),
        "ind": np.asarray(clean.ind),
        "val": np.asarray(clean.val),
        "base": np.int64(int(h.base)),
    }
    if h.ilu_state is not None:
        payload["ilu_lu"] = np.asarray(h.ilu_state.lu)
    np.savez_compressed(Path(path), **payload)


def load_matrix(path) -> SparseMatrix:
    """Restore a handle; re-attaches the ILU0 factor if present (the solve
    forms rebuild lazily on first apply)."""
    z = np.load(Path(path))
    if int(z["format_version"]) != _FORMAT_VERSION:
        raise AoclSparseError(
            Status.invalid_value, f"unknown checkpoint version {int(z['format_version'])}"
        )
    m, n = int(z["m"]), int(z["n"])
    A = CSR(z["ptr"], z["ind"], z["val"], shape=(m, n))
    h = SparseMatrix(A, FormatType.csr, IndexBase(int(z["base"])))
    if "ilu_lu" in z.files:
        # rebuild the IluState around the saved LU values
        from ..planner.plan import get_plan
        from ..solvers.ilu import IluState

        plan = get_plan(h)
        import jax.numpy as jnp

        from ..planner.plan import CleanCSR

        clean = plan.clean
        lu_d = jnp.asarray(z["ilu_lu"])  # saved in clean order (see save_matrix)
        lu_clean = CleanCSR(
            ptr=clean.ptr,
            ind=clean.ind,
            val=lu_d,
            perm=np.arange(z["ilu_lu"].size, dtype=np.int64),
            idiag=clean.idiag,
            iurow=clean.iurow,
            has_diag=clean.has_diag,
            fulldiag=clean.fulldiag,
            shape=clean.shape,
        )
        st = IluState(lu=lu_d, lu_clean=lu_clean)
        _attach_solve_forms(st, lu_clean)
        h.ilu_state = st
    return h


def _attach_solve_forms(st, lu_clean) -> None:
    from ..core.descr import MatrixDescriptor
    from ..core.types import DiagType, FillMode, MatrixType, Operation
    from ..planner.plan import build_effective_csr
    from ..planner.triangular import adaptive_nb, build_trsv_form

    l_descr = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.lower, diag_type=DiagType.unit
    )
    u_descr = MatrixDescriptor(
        type=MatrixType.triangular, fill_mode=FillMode.upper, diag_type=DiagType.non_unit
    )
    eff_l = build_effective_csr(lu_clean, l_descr, Operation.none)
    eff_u = build_effective_csr(lu_clean, u_descr, Operation.none)
    nb = adaptive_nb(lu_clean.m, dtype=np.asarray(lu_clean.val).dtype)
    st.l_form = build_trsv_form(lu_clean, l_descr, Operation.none, ("ilu", "l"), eff_l, nb)
    st.u_form = build_trsv_form(lu_clean, u_descr, Operation.none, ("ilu", "u"), eff_u, nb)
