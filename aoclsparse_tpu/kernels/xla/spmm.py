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


@partial(jax.jit, static_argnames=("G", "Wg", "base", "n_pad", "mixed"))
def spmm_bwd(grp_val, B, G: int, Wg: int, base: int, n_pad: int, mixed: bool = False):
    """Group-banded SpMM — TPU block-band path (see spmv_bwd for rationale).

    Rows are grouped into blocks of G; each group's band window (G + halo) is
    materialized densely: grp_val (ngrp, G, Wg), window of group g covering
    rows [G*(g + base) .. +Wg) of the padded B. Compute is a lax.scan over
    groups, each step ONE plain 2-D (G x Wg) @ (Wg x k) MXU matmul against a
    dynamic slice of B — zero gathers, and deliberately NO batched
    dot_general (measured catastrophically slow on this TPU stack: 0.1-0.15
    TFLOP/s for batched vs ~36 TFLOP/s for 2-D). csrmm analog of the
    reference's blocked SpMM (level3/aoclsparse_csrmm.hpp)."""
    ngrp = grp_val.shape[0]
    k = B.shape[1]
    out_dtype = grp_val.dtype
    acc = jnp.float32 if mixed or grp_val.dtype == jnp.float32 else grp_val.dtype
    if mixed:
        grp_val = grp_val.astype(jnp.bfloat16)
        B = B.astype(jnp.bfloat16)

    # Build all B windows with STATIC slices (traced dynamic_slice costs
    # ~0.4 ms per call on this stack), then scan plain 2-D matmuls.
    nslice = -(-Wg // G)
    Br2 = B.reshape(-1, G * k)  # (n_pad/G, G*k) — pure view
    wins2 = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(Br2, base + j, ngrp, 0) for j in range(nslice)],
        axis=1,
    )  # static starts; (ngrp, nslice*G*k)
    wins = wins2.reshape(ngrp, nslice * G, k)[:, :Wg, :]

    def step(_, args):
        a_g, w_g = args
        return None, jnp.dot(a_g, w_g, preferred_element_type=acc)

    _, outs = jax.lax.scan(step, None, (grp_val, wins))
    return outs.reshape(ngrp * G, k).astype(out_dtype)
