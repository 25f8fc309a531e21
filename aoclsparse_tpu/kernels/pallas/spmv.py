"""Pallas TPU band-window SpMV kernel.

The Pallas twin of kernels/xla/spmv.py::spmv_bwd: grid over row tiles; each
step holds a (TM, W) slab of the dense band values and two adjacent TM-wide
chunks of the padded x in VMEM (the overlapping window = two non-overlapping
BlockSpec views of the same array, stitched in-kernel), computes the
per-row masked dot on the VPU, and writes a (TM/8, 8) output tile.

NOTE (this environment): per-grid-step overhead through the axon tunnel
measured ~3-100us, so the fused XLA formulation usually wins end-to-end;
this kernel registers at higher priority only when
AOCLSPARSE_TPU_ENABLE_PALLAS=1, and runs under interpret mode on CPU for
tests. (Guide: /opt/skills/guides/pallas_guide.md.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_spmv_bwd"]


def _kernel(val_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int):
    xwin = jnp.concatenate(
        [x0_ref[0].reshape(-1), x1_ref[0].reshape(-1)], axis=0
    )  # (2*TM,)
    xr = xwin.reshape(-1, 8)  # (2*TM/8, 8)
    nblk_t = TM // 8
    # pats[b, t] = xwin[8*b + t] for t in [0, W)
    pats = jnp.concatenate(
        [xr[j : j + nblk_t] for j in range(W // 8)], axis=1
    )  # (TM/8, W) — static slices (Mosaic has no dynamic_slice)
    v = val_ref[:].reshape(nblk_t, 8, W)
    out_ref[:] = jnp.sum(v * pats[:, None, :], axis=2)  # (TM/8, 8)


@partial(jax.jit, static_argnames=("W", "base8", "n_pad", "TM", "interpret"))
def pallas_spmv_bwd(
    win_val, xp, W: int, base8: int, n_pad: int, TM: int = 1024, interpret: bool = False
):
    """y = A @ x on the planner's bwd operand. win_val (nblk, 8, W); xp the
    padded x (n_pad,). For compiled TPU runs TM must be a multiple of 1024
    (block alignment); interpret-mode tests may use smaller tiles."""
    nblk = win_val.shape[0]
    m_rows = nblk * 8
    if interpret:
        TM = min(TM, max(8, m_rows))
        if W > TM:
            TM = -(-W // 8) * 8
    elif W > TM:
        TM = -(-W // 1024) * 1024  # grow so two chunks cover the window
    ntile = -(-m_rows // TM)
    m_pad_t = ntile * TM
    v2 = win_val.reshape(m_rows, W)
    if m_pad_t != m_rows:
        v2 = jnp.pad(v2, ((0, m_pad_t - m_rows), (0, 0)))

    # Align the window start to TM-chunk boundaries: tile t's window begins
    # at element 8*(t*TM/8 + base8) = t*TM + 8*base8; roll x left by the
    # non-chunk-aligned remainder so chunks (t+coarse) and (t+coarse+1)
    # cover it.
    off = 8 * base8
    coarse, rem = divmod(off, TM)
    need = (ntile + coarse + 2) * TM + rem
    xc = xp
    if xc.shape[0] < need:
        xc = jnp.pad(xc, (0, need - xc.shape[0]))
    if rem:
        xc = jnp.roll(xc, -rem)
    nchunk = xc.shape[0] // TM
    # (nchunk, 8, TM/8) — Mosaic needs (8k, 128k)-aligned trailing block dims,
    # satisfied when TM is a multiple of 1024 (TM/8 % 128 == 0) or in
    # interpret mode (tests use small TM there)
    x3 = xc[: nchunk * TM].reshape(nchunk, 8, TM // 8)

    out = pl.pallas_call(
        partial(_kernel, TM=TM, W=W),
        out_shape=jax.ShapeDtypeStruct((m_pad_t // 8, 8), win_val.dtype),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((TM, W), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TM // 8), lambda t: (t + coarse, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, TM // 8), lambda t: (t + coarse + 1, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TM // 8, 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v2, x3, x3)
    return out.reshape(-1)[:m_rows]
