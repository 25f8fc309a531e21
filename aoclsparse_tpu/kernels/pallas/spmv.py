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

__all__ = ["pallas_spmv_bwd", "pallas_spmv_band_t", "spmv_bandt"]


@partial(
    jax.jit,
    static_argnames=("W", "padL", "start", "TM", "interpret", "has_spill"),
)
def spmv_bandt(
    vt,
    x,
    sp_val,
    sp_ind,
    sp_rows,
    W: int,
    padL: int,
    start: int,
    TM: int = 2048,
    interpret: bool = False,
    has_spill: bool = False,
):
    """Full bandt dispatch: pad x, run the Pallas transposed-band kernel,
    add the planner's peel spill (sorted segment-sum) — one compiled
    program around the pallas_call."""
    m = vt.shape[1]
    xe = jnp.pad(x, (padL, 0))
    y = pallas_spmv_band_t(vt, xe, W, start, TM=TM, interpret=interpret)
    if has_spill:
        y = y + jax.ops.segment_sum(
            sp_val * x[sp_ind], sp_rows, num_segments=m, indices_are_sorted=True
        )
    return y


# ---------------------------------------------------------------------------
# band SpMM: same transposed-band layout, dense (n, k) RHS
# ---------------------------------------------------------------------------


def _kernel_mm(v_ref, b0_ref, b1_ref, out_ref, *, TM: int, W: int, K: int):
    """C[i, :] = sum_j v[i, j] * Bwin[i + j, :] for a TM-row tile.

    v: (TM, W) row-aligned band (NOT transposed — column j is an
    unaligned LANE slice, which Mosaic supports; unaligned SUBLANE slices
    of the B window crash the compiler, so the window advances by
    pltpu.roll instead of slicing at offset j)."""
    R0 = jnp.concatenate([b0_ref[:], b1_ref[:]], axis=0)  # (2*TM, K)
    # 8 pre-rotated copies: window j = j0 + r reads rot[r][j0 : j0+TM] with
    # j0 a multiple of 8 — all sublane slices 8-aligned (unaligned sublane
    # slices crash Mosaic; lane slices may be unaligned)
    rots = [R0] + [pltpu.roll(R0, 2 * TM - r, axis=0) for r in range(1, 8)]
    acc = jnp.zeros((TM, K), dtype=out_ref.dtype)
    for j in range(W):
        j0, r = (j // 8) * 8, j % 8
        vj = v_ref[:, j : j + 1].astype(out_ref.dtype)  # (TM, 1)
        acc = acc + vj * rots[r][j0 : j0 + TM, :].astype(out_ref.dtype)
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("W", "start", "TM", "interpret"))
def pallas_spmm_band_t(v, Be, W: int, start: int, TM: int = 512, interpret: bool = False):
    """Row-aligned band SpMM: C[i, :] = sum_j v[i, j] * Be[start + i + j, :].

    v: (m, W) row-aligned band (v[i, j] = A[i, i + lo + j]); Be: padded
    (ne, K) dense RHS with Be[start + i + lo + j] = B[i + lo + j] (caller
    embeds lo). K must be a multiple of 128. Requires W <= TM."""
    m, Wm = v.shape
    K = Be.shape[1]
    assert Wm == W and W <= TM
    ntile = -(-m // TM)
    m_pad = ntile * TM
    if m_pad != m:
        v = jnp.pad(v, ((0, m_pad - m), (0, 0)))
    # pad the band's lane dim to a 128 multiple: lane slices beyond the
    # first lane tile of a non-128-multiple block crash Mosaic
    W_pad = -(-W // 128) * 128
    if W_pad != W:
        v = jnp.pad(v, ((0, 0), (0, W_pad - W)))
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if Be.shape[0] < need:
        Be = jnp.pad(Be, ((0, need - Be.shape[0]), (0, 0)))
    if rem:
        Be = jnp.roll(Be, -rem, axis=0)
    nchunk = Be.shape[0] // TM
    B3 = Be[: nchunk * TM]
    odt = jnp.float32 if v.dtype == jnp.bfloat16 else v.dtype

    out = pl.pallas_call(
        partial(_kernel_mm, TM=TM, W=W, K=K),
        out_shape=jax.ShapeDtypeStruct((m_pad, K), odt),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((TM, W_pad), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, K), lambda t: (t + coarse, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, K), lambda t: (t + coarse + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, K), lambda t: (t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v, B3, B3)
    return out[:m]


@partial(
    jax.jit,
    static_argnames=("W", "padL", "start", "TM", "interpret", "has_spill"),
)
def spmm_bandtm(
    v,
    B,
    sp_val,
    sp_ind,
    sp_rows,
    W: int,
    padL: int,
    start: int,
    TM: int = 256,
    interpret: bool = False,
    has_spill: bool = False,
):
    """Full band-SpMM dispatch: pad B rows, run the Pallas kernel, add the
    peel spill (row-gathered B rows, tiny) — one compiled program."""
    m = v.shape[0]
    Be = jnp.pad(B, ((padL, 0), (0, 0)))
    C = pallas_spmm_band_t(v, Be, W, start, TM=TM, interpret=interpret)
    if has_spill:
        contrib = sp_val[:, None] * B[sp_ind]
        C = C + jax.ops.segment_sum(
            contrib, sp_rows, num_segments=m, indices_are_sorted=True
        )
    return C


# ---------------------------------------------------------------------------
# v2: transposed-band kernel — Mosaic-friendly layouts (the v1 kernel's
# (..., 8)-lane reshapes and 17-piece unaligned concat crash the Mosaic
# compiler on the real chip; all v2 shapes are (sublanes, 128k lanes))
# ---------------------------------------------------------------------------


def _kernel_t(vt_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int):
    """y[i] = sum_j vt[j, i] * xwin[i + j] for a TM-row tile.

    vt: (W, TM) transposed band slab; x chunks arrive as (8, TM/8) tiles
    (legal Mosaic blocks) and are flattened to a (1, 2*TM) lane vector.
    The j loop unrolls into W vector FMAs with static lane slices — pure
    VPU work, band streamed from HBM exactly once."""
    x0 = x0_ref[:].reshape(1, TM)
    x1 = x1_ref[:].reshape(1, TM)
    xwin = jnp.concatenate([x0, x1], axis=1)  # (1, 2*TM)
    acc = jnp.zeros((1, TM), dtype=out_ref.dtype)
    for j in range(W):
        acc = acc + vt_ref[j : j + 1, :].astype(out_ref.dtype) * (
            xwin[:, j : j + TM].astype(out_ref.dtype)
        )
    out_ref[:] = acc.reshape(8, TM // 8)


@partial(jax.jit, static_argnames=("W", "start", "TM", "interpret"))
def pallas_spmv_band_t(vt, xe, W: int, start: int, TM: int = 1024, interpret: bool = False):
    """Row-aligned band SpMV: y[i] = sum_j vt[j, i] * xe[start + i + j].

    vt: (W, m) TRANSPOSED row-aligned band (vt[j, i] = A[i, i + lo + j]);
    xe: padded x with xe[start + i + lo + j] = x[i + lo + j] (caller embeds
    lo into `start`). Requires W <= TM."""
    Wm, m = vt.shape
    assert Wm == W and W <= TM
    ntile = -(-m // TM)
    m_pad = ntile * TM
    if m_pad != m:
        vt = jnp.pad(vt, ((0, 0), (0, m_pad - m)))
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if xe.shape[0] < need:
        xe = jnp.pad(xe, (0, need - xe.shape[0]))
    if rem:
        xe = jnp.roll(xe, -rem)
    nchunk = xe.shape[0] // TM
    # chunks as (8, TM/8) tiles: legal (8, 128k) Mosaic blocks; chunk c is
    # rows [8c, 8c+8) of the (nchunk*8, TM/8) layout
    x2 = xe[: nchunk * TM].reshape(nchunk * 8, TM // 8)
    odt = jnp.float32 if vt.dtype == jnp.bfloat16 else vt.dtype

    out = pl.pallas_call(
        partial(_kernel_t, TM=TM, W=W),
        out_shape=jax.ShapeDtypeStruct((ntile * 8, TM // 8), odt),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((W, TM), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM // 8), lambda t: (t + coarse, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM // 8), lambda t: (t + coarse + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TM // 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vt, x2, x2)
    return out.reshape(-1)[:m]


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
