"""Pallas sequential-grid blocked TRSV.

The XLA blocked solve (kernels/xla/trsv.py) pays ~8us of lax.scan overhead
per block step, which forces large blocks (nb=512) whose dense inverted
diagonal blocks dominate HBM traffic (m*nb*4 bytes). Pallas grid steps on
TPU execute sequentially on the core with VMEM scratch persisting across
steps, so the rolling solve window can be carried in scratch at ~1us/step —
smaller blocks become viable and the Dinv stream shrinks proportionally.

Layout rules learned on this Mosaic stack (see kernels/pallas/spmv.py):
all blocks (8k sublanes, 128k lanes or = array dim); vectors ride lanes as
(1, nb) with (8, nb/8) <-> (1, nb) reshapes; matmuls are row-vector forms
against pre-transposed operands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _imap32(fn):
    """Wrap a BlockSpec index map so Python-int components come out i32.

    Under jax_enable_x64 a bare int in the index-map return traces as an
    i64 constant and Mosaic fails to legalize the map's func.return
    (measured on v5e: any kernel traced while x64 is on — e.g. by an f64
    caller or a user running x64 globally — failed to compile). Tracer
    components (the grid index and sums with it) are already i32."""

    def wrapped(*idx):
        out = fn(*idx)
        if not isinstance(out, tuple):
            out = (out,)
        return tuple(np.int32(c) if isinstance(c, int) else c for c in out)

    return wrapped


__all__ = ["pallas_trsv_win_inv", "pallas_trsv_win_inv8", "pallas_trsm_win_inv"]


def _kernel8(dinvT_ref, lwT_ref, b_ref, out_ref, w_scr, *, nb: int, WL: int):
    """8 solve blocks per grid step (small-nb path): every sub-slice is
    nb-aligned (nb a multiple of 8), vectors ride (1, nb) lane rows of an
    (8, nb) tile extracted via pltpu.roll + row-0 slice (unaligned sublane
    slices crash Mosaic)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        w_scr[:] = jnp.zeros((1, WL), w_scr.dtype)

    b_blk = b_ref[0]  # (8, nb)
    rows = []
    w = w_scr[:]
    for r in range(8):
        br = b_blk[0:1, :] if r == 0 else pltpu.roll(b_blk, np.int32(8 - r), axis=0)[0:1, :]
        dT = dinvT_ref[0][r * nb : (r + 1) * nb, :]  # (nb, nb), aligned
        lT = lwT_ref[0][r * WL : (r + 1) * WL, :]  # (WL, nb), aligned
        s = jnp.dot(w, lT, preferred_element_type=w.dtype)
        xk = jnp.dot(br - s, dT, preferred_element_type=w.dtype)  # (1, nb)
        rows.append(xk)
        w = jnp.concatenate([w, xk], axis=1)[:, -WL:]
    out_ref[0] = jnp.concatenate(rows, axis=0)  # (8, nb)
    w_scr[:] = w


@partial(jax.jit, static_argnames=("nb", "WL", "interpret"))
def pallas_trsv_win_inv8(dinvT, lwT, b, nb: int, WL: int, interpret: bool = False):
    """Small-nb variant: 8 blocks per grid step. dinvT: (nblk, nb, nb),
    lwT: (nblk, WL, nb), b: (nblk*nb,); nblk must be a multiple of 8,
    nb a multiple of 128, WL a multiple of 8."""
    nblk = dinvT.shape[0]
    assert nblk % 8 == 0 and nb % 128 == 0 and WL % 8 == 0
    ng = nblk // 8
    d8 = dinvT.reshape(ng, 8 * nb, nb)
    l8 = lwT.reshape(ng, 8 * WL, nb)
    b3 = b.reshape(ng, 8, nb)
    out = pl.pallas_call(
        partial(_kernel8, nb=nb, WL=WL),
        out_shape=jax.ShapeDtypeStruct((ng, 8, nb), dinvT.dtype),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, 8 * nb, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * WL, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, WL), dinvT.dtype)],
        interpret=interpret,
    )(d8, l8, b3)
    return out.reshape(nblk * nb)


def _kernel(dinvT_ref, lwT_ref, b_ref, out_ref, w_scr, *, nb: int, WL: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        w_scr[:] = jnp.zeros((1, WL), w_scr.dtype)

    w = w_scr[:]  # (1, WL) = x rows [blk0-WL, blk0)
    s = jnp.dot(w, lwT_ref[0], preferred_element_type=w.dtype)  # (1, nb)
    bk = b_ref[0].reshape(1, nb)
    xk = jnp.dot(bk - s, dinvT_ref[0], preferred_element_type=w.dtype)  # (1, nb)
    out_ref[0] = xk.reshape(8, nb // 8)
    w_scr[:] = jnp.concatenate([w, xk], axis=1)[:, -WL:]


@partial(jax.jit, static_argnames=("nb", "WL", "interpret"))
def pallas_trsv_win_inv(dinvT, lwT, b, nb: int, WL: int, interpret: bool = False):
    """x = solve with pre-inverted diagonal blocks (row-vector forms):

        x_k = (b_k - w @ LwinT_k) @ DinvT_k ;  w <- [w, x_k][-WL:]

    dinvT: (nblk, nb, nb) with dinvT[k] = Dinv_k^T; lwT: (nblk, WL, nb)
    with lwT[k] = Lwin_k^T; b: (nblk*nb,). WL and nb must be multiples of
    8 with nb a multiple of 128 (the padded-lane vector layout) and
    WL <= nb."""
    nblk = dinvT.shape[0]
    b3 = b.reshape(nblk, 8, nb // 8)
    out = pl.pallas_call(
        partial(_kernel, nb=nb, WL=WL),
        out_shape=jax.ShapeDtypeStruct((nblk, 8, nb // 8), dinvT.dtype),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, nb, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WL, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nb // 8), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, nb // 8), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, WL), dinvT.dtype)],
        interpret=interpret,
    )(dinvT, lwT, b3)
    return out.reshape(nblk * nb)


def _kernel_mrhs(dinvT_ref, lwT_ref, b_ref, out_ref, w_scr, *, nb: int, WL: int, K: int):
    """Multi-RHS generalization of _kernel: the K transposed RHS columns
    ride as (K, nb) lane rows, the rolling window as (K, WL) scratch —
    identical row-vector algebra, K rows at a time (TRSM analog of the
    sequential-grid TRSV; XLA twin pays ~8us scan overhead per step for
    every RHS batch, this pays it once per block in grid time)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        w_scr[:] = jnp.zeros((K, WL), w_scr.dtype)

    w = w_scr[:]  # (K, WL): x rows [blk0-WL, blk0) for every RHS column
    s = jnp.dot(w, lwT_ref[0], preferred_element_type=w.dtype)  # (K, nb)
    xk = jnp.dot(b_ref[0] - s, dinvT_ref[0], preferred_element_type=w.dtype)
    out_ref[0] = xk
    w_scr[:] = jnp.concatenate([w, xk], axis=1)[:, -WL:]


@partial(jax.jit, static_argnames=("nb", "WL", "interpret"))
def pallas_trsm_win_inv(dinvT, lwT, Bt, nb: int, WL: int, interpret: bool = False):
    """Multi-RHS sequential-grid solve with pre-inverted diagonal blocks.

    dinvT: (nblk, nb, nb) = Dinv_k^T; lwT: (nblk, WL, nb) = Lwin_k^T;
    Bt: (nblk, K, nb) — RHS blocks TRANSPOSED so columns ride lanes
    (caller does Bt = B.reshape(nblk, nb, K).swapaxes(1, 2)). K must be a
    multiple of 8, nb a multiple of 128, WL a multiple of 8, WL <= nb.
    Returns Xt with Bt's layout."""
    nblk, K, _ = Bt.shape
    assert K % 8 == 0 and nb % 128 == 0 and WL % 8 == 0 and WL <= nb
    out = pl.pallas_call(
        partial(_kernel_mrhs, nb=nb, WL=WL, K=K),
        out_shape=jax.ShapeDtypeStruct((nblk, K, nb), dinvT.dtype),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, nb, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WL, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, nb), _imap32(lambda k: (k, 0, 0)), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, WL), dinvT.dtype)],
        interpret=interpret,
    )(dinvT, lwT, Bt)
    return out
