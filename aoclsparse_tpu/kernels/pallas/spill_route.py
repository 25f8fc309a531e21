"""One-hot MXU select / accumulate kernels for the spill-route SpMV engine.

The gen composite's unstructured spill tail (webbase/scircuit class) was
served by an x-gather + segment-sum at the measured ~13-18 ns/entry
irregular-op floor (VERDICT r4 item 1). The spill-route engine replaces
both index ops with three gather-free phases:

  select:  contrib[slot] = val[slot] * x[col[slot]]   (entries grouped by
           1024-wide column block; the in-block pick is an iota-compare
           one-hot contracted on the MXU — "sort-free segmented one-hot")
  route:   a Benes network moves contribs from column-sorted slots to
           row-sorted slots (kernels/xla/route.py, masks planned once)
  accum:   y[row] += contrib[slot]  (entries grouped by 1024-row block;
           the in-block scatter is the transposed one-hot contraction)

Per 128-entry lane group the select is one (8,128)@(128,128) MXU matmul
plus a sublane-mask reduction; the accumulate is its mirror. All index
tiles are int32 (i64-free under x64 tracing, kernels/pallas/spmv.py note).
Reference counterpart: the generic CSR row loop serves these matrices on
CPU (level2/aoclsparse_csrmv_kr.hpp:450); TPUs have no scalar-gather path
worth using, hence this engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmv import _imap32

__all__ = ["pallas_oh_select", "pallas_oh_accum"]


def _select_kernel(blk_ref, idx_ref, val_ref, x_ref, o_ref):
    xb = x_ref[0]  # (8, 128) x values of this chunk's column block
    idx3 = idx_ref[0]  # (8, 128) local col index 0..1023
    val3 = val_ref[0]
    lane = (idx3 & np.int32(127)).astype(jnp.int32)
    sub = (idx3 >> np.int32(7)).astype(jnp.int32)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    rows = []
    for g in range(8):
        ln_g = jax.lax.slice(lane, (g, 0), (g + 1, 128))  # (1, 128)
        oh = (iota_c == ln_g).astype(xb.dtype)  # (128c, 128e)
        # HIGHEST: the default bf16 MXU pass truncates the x operand
        # (measured 4.8e-3 rel err on the webbase-scale probe; same pin as
        # kernels/pallas/spgemm.py)
        C = jax.lax.dot_general(
            xb, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (8s, 128e)
        mask = iota_s == jax.lax.slice(sub, (g, 0), (g + 1, 128))
        sel = jnp.sum(jnp.where(mask, C, 0.0), axis=0, keepdims=True)
        rows.append(sel * jax.lax.slice(val3, (g, 0), (g + 1, 128)))
    o_ref[0] = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_oh_select(x3, sel_idx, sel_val, sel_blk, interpret: bool = False):
    """contrib tiles (nc, 8, 128) = val * x[col] per chunk; x3 is the
    padded x reshaped (nxblk, 8, 128); sel_blk (nc,) int32 names each
    chunk's column block (scalar-prefetch index map)."""
    nc = sel_idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk: (i, 0, 0))),
            pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk: (i, 0, 0))),
            pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk: (blk[i], 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk: (i, 0, 0))),
    )
    return pl.pallas_call(
        _select_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc, 8, 128), x3.dtype),
        interpret=interpret,
    )(sel_blk, sel_idx, sel_val, x3)


def _accum_kernel(blk_ref, cid_ref, idx_ref, c_ref, yin_ref, o_ref):
    i = pl.program_id(0)
    prev = blk_ref[jnp.maximum(i - np.int32(1), np.int32(0))]
    first = jnp.logical_or(i == np.int32(0), blk_ref[i] != prev)
    idx3 = idx_ref[0]
    c3 = c_ref[0]
    lane = (idx3 & np.int32(127)).astype(jnp.int32)
    sub = (idx3 >> np.int32(7)).astype(jnp.int32)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    acc = jnp.zeros((8, 128), jnp.float32)
    for g in range(8):
        cg = jax.lax.slice(c3, (g, 0), (g + 1, 128))
        w8 = jnp.where(
            iota_s == jax.lax.slice(sub, (g, 0), (g + 1, 128)),
            jnp.broadcast_to(cg, (8, 128)),
            0.0,
        ).astype(jnp.float32)
        ohl = (iota_c == jax.lax.slice(lane, (g, 0), (g + 1, 128))).astype(jnp.float32)
        # contraction over the entry lanes of both operands: (8,128e) x
        # (128c,128e) -> (8,128c)
        acc = acc + jax.lax.dot_general(
            w8, ohl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    @pl.when(first)
    def _init():
        o_ref[0] = (yin_ref[0].astype(jnp.float32) + acc).astype(o_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _add():
        o_ref[0] = (o_ref[0].astype(jnp.float32) + acc).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_oh_accum(ctiles, acc_idx, acc_blk, acc_cid, y3, interpret: bool = False):
    """y blocks (nyblk, 8, 128) += one-hot accumulation of contrib tiles.

    acc_blk (nc,) int32: the y block each chunk adds into — MONOTONE
    nondecreasing and covering EVERY y block (untouched blocks carry one
    all-pad chunk whose acc_cid points at the trailing zero tile), so the
    output is fully defined without aliasing. Consecutive chunks of the
    same block accumulate in VMEM (the out block flushes on index change).
    """
    nc = acc_idx.shape[0]
    nyblk = y3.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk, cid: (i, 0, 0))),
            pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk, cid: (cid[i], 0, 0))),
            pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk, cid: (blk[i], 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), _imap32(lambda i, blk, cid: (blk[i], 0, 0))),
    )
    return pl.pallas_call(
        _accum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nyblk, 8, 128), y3.dtype),
        interpret=interpret,
    )(acc_blk, acc_cid, acc_idx, ctiles, y3)
