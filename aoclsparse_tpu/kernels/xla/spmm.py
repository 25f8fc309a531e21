"""SpMM kernels: C = op(A) @ B, sparse x dense (csrmm analog).

Reference: level3/aoclsparse_csrmm.{cpp,hpp} + csrmm_kt.cpp — OpenMP rows x
4-wide column tiles of B. TPU formulation: the dense RHS makes this op far
more MXU/VPU-friendly than SpMV — each gathered B row is a full lane vector,
so the (m, w, k) padded form keeps the VPU busy and XLA fuses the masked
multiply into the row reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["spmm_segsum", "spmm_ell", "spmm_ellhyb"]


@partial(jax.jit, static_argnames=("m",))
def spmm_segsum(ind, val, row_ids, B, m: int):
    """(nnz,k) gather + segment-sum over rows."""
    prods = val[:, None] * B[ind]
    return jax.ops.segment_sum(prods, row_ids, num_segments=m, indices_are_sorted=True)


@jax.jit
def spmm_ell(ind, val, B):
    """Padded-row form: gather (m, w, k) tiles of B, mask, reduce over w."""
    g = jnp.take(B, jnp.maximum(ind, 0), axis=0)  # (m, w, k)
    prods = jnp.where(
        (ind >= 0)[..., None], val[..., None] * g, jnp.zeros((), dtype=val.dtype)
    )
    return jnp.sum(prods, axis=1)


@partial(jax.jit, static_argnames=("m",))
def spmm_ellhyb(ell_ind, ell_val, sp_ind, sp_val, sp_rows, B, m: int):
    C = spmm_ell(ell_ind, ell_val, B)
    if sp_ind.shape[0]:
        C = C + jax.ops.segment_sum(
            sp_val[:, None] * B[sp_ind], sp_rows, num_segments=m, indices_are_sorted=True
        )
    return C
