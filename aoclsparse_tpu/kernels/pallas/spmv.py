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


def bandv_tm(W: int, itemsize: int = 4, vmem_budget: int = 6 * 2**20) -> int:
    """Default grid tile for the vertical-layout band kernels: the largest
    power-of-2 TM in [1024, 8192] whose band block (W * TM * itemsize
    bytes) stays double-bufferable in VMEM. Measured on v5e (probe_tm
    sweeps, RESULTS_r3.md): TM=8192 runs the bf16 cant-class band ~16%
    faster than the old fixed 2048 (211.7 vs 252.9 us/iter) — fewer grid
    steps amortize the per-tile slab build; f32 is HBM-bound and moves
    <2%. Env override: AOCLSPARSE_TPU_BANDV_TM."""
    import os

    env = os.environ.get("AOCLSPARSE_TPU_BANDV_TM")
    if env:
        return int(env)
    tm = 8192
    while tm > 1024 and W * tm * itemsize > vmem_budget:
        tm //= 2
    return tm


__all__ = [
    "bandv_tm",
    "pallas_spmv_bwd",
    "pallas_spmv_band_t",
    "pallas_spmv_band_v",
    "pallas_spmv_band_vc",
    "pallas_spmv_band_vd",
    "pallas_spmv_band_v_df",
    "band_vert_layout",
    "band_vert_layout_tiles",
    "pallas_spmv_band_mxu",
    "pallas_spmm_band_mxu",
    "pallas_spmm_diag",
    "diagmm_tiles",
    "band_mxu_blocks",
    "spmv_bandt",
    "spmv_bandv",
    "spmv_bandv_df",
]


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


@partial(
    jax.jit,
    static_argnames=("m", "W", "padL", "start", "TM", "interpret", "has_spill"),
)
def spmv_bandv(
    vt4,
    x,
    sp_val,
    sp_ind,
    sp_rows,
    m: int,
    W: int,
    padL: int,
    start: int,
    TM: int = 2048,
    interpret: bool = False,
    has_spill: bool = False,
):
    """Full bandv dispatch (mv KID 12): pad x, run the vertical-layout
    Pallas kernel (pallas_spmv_band_v) on the pre-transformed band
    (ExecForm.bandt_vertical), add the planner's peel spill — one compiled
    program. Same math contract as spmv_bandt; vt4 may be bf16 under the
    docs/precision.md policy (f32 accumulate)."""
    xe = jnp.pad(x, (padL, 0))
    y = pallas_spmv_band_v(vt4, xe, W, start, TM=TM, interpret=interpret)[:m]
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
    rots = [R0] + [pltpu.roll(R0, np.int32(2 * TM - r), axis=0) for r in range(1, 8)]
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
            pl.BlockSpec((TM, W_pad), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, K), _imap32(lambda t: (t + coarse, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, K), _imap32(lambda t: (t + coarse + 1, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, K), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
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
    """Full band-SpMM dispatch: pad B rows (and K to a lane multiple), run
    the Pallas kernel, add the peel spill (row-gathered B rows, tiny) —
    one compiled program."""
    m = v.shape[0]
    K = B.shape[1]
    K_pad = -(-K // 128) * 128
    Be = jnp.pad(B, ((padL, 0), (0, K_pad - K)))
    C = pallas_spmm_band_t(v, Be, W, start, TM=TM, interpret=interpret)[:, :K]
    if has_spill:
        contrib = sp_val[:, None] * B[sp_ind]
        C = C + jax.ops.segment_sum(
            contrib, sp_rows, num_segments=m, indices_are_sorted=True
        )
    return C


@partial(
    jax.jit,
    static_argnames=("m", "padL", "start", "TM", "interpret", "has_spill"),
)
def spmm_bandmxu(
    dt,
    B,
    sp_val,
    sp_ind,
    sp_rows,
    m: int,
    padL: int,
    start: int,
    TM: int = 1024,
    interpret: bool = False,
    has_spill: bool = False,
):
    """Full MXU band-SpMM dispatch (mm KID 5): pad B rows (and its width to
    a lane multiple), run pallas_spmm_band_mxu on the pre-transposed window
    blocks (ExecForm.band_mxu_dt), add the peel spill — one compiled
    program. dt may be bf16 under the docs/precision.md policy."""
    K = B.shape[1]
    K_pad = -(-K // 128) * 128
    Be = jnp.pad(B, ((padL, 0), (0, K_pad - K)))
    C = pallas_spmm_band_mxu(dt, Be, start, TM=TM, interpret=interpret)[:m, :K]
    if has_spill:
        contrib = sp_val[:, None] * B[sp_ind]
        C = C + jax.ops.segment_sum(
            contrib, sp_rows, num_segments=m, indices_are_sorted=True
        )
    return C


def _kernel_mm_mxu(dt_ref, b0_ref, b1_ref, out_ref, *, NB: int, K: int):
    """MXU block-window band SpMM tile: NB row-blocks of 128, each a
    (256, 128)^T x (256, K) MXU matmul over an ALIGNED 256-row sublane
    slice of the B window — the per-column VPU FMA chain of _kernel_mm
    disappears entirely; compute rides the MXU and the kernel's floor is
    the dt + B streaming."""
    Bcat = jnp.concatenate([b0_ref[:], b1_ref[:]], axis=0)  # (2*TM, K)
    prec = None if dt_ref.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    outs = []
    for q in range(NB):
        Bwin = Bcat[128 * q : 128 * q + 256, :].astype(dt_ref.dtype)
        outs.append(
            jax.lax.dot_general(
                dt_ref[q],
                Bwin,
                (((0,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=out_ref.dtype,
            )
        )  # (128, K)
    out_ref[:] = jnp.concatenate(outs, axis=0)  # (TM, K)


@partial(jax.jit, static_argnames=("start", "TM", "interpret"))
def pallas_spmm_band_mxu(dt, Be, start: int, TM: int = 1024, interpret: bool = False):
    """Block-window band SpMM: C[128k+s, :] = sum_c dt[k, c, s] * Be[start+128k+c, :].

    dt: the same (nblk, 256, 128) pre-transposed window blocks as
    pallas_spmv_band_mxu (band_mxu_blocks); Be: padded (ne, K) dense RHS.
    K must be a multiple of 128; TM a multiple of 128. dt may be bf16
    (B window cast to bf16, f32 accumulate on the MXU)."""
    nblk = dt.shape[0]
    m = nblk * 128
    K = Be.shape[1]
    assert TM % 128 == 0 and K % 128 == 0
    NB = TM // 128
    ntile = -(-nblk // NB)
    if ntile * NB != nblk:
        dt = jnp.pad(dt, ((0, ntile * NB - nblk), (0, 0), (0, 0)))
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if Be.shape[0] < need:
        Be = jnp.pad(Be, ((0, need - Be.shape[0]), (0, 0)))
    if rem:
        Be = jnp.roll(Be, -rem, axis=0)
    nchunk = Be.shape[0] // TM
    B3 = Be[: nchunk * TM]
    odt = jnp.float32 if dt.dtype == jnp.bfloat16 else dt.dtype

    out = pl.pallas_call(
        partial(_kernel_mm_mxu, NB=NB, K=K),
        out_shape=jax.ShapeDtypeStruct((ntile * TM, K), odt),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((NB, 256, 128), _imap32(lambda t: (t, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, K), _imap32(lambda t: (t + coarse, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, K), _imap32(lambda t: (t + coarse + 1, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, K), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dt, B3, B3)
    return out[:m]


# ---------------------------------------------------------------------------
# diag SpMM: C^T formulation — the per-diagonal row shift lands on the
# LANE axis (unaligned lane slices are legal Mosaic; unaligned SUBLANE
# slices crash, which is why _kernel_mm needs 8 pre-rotated window copies).
# Serves the wide-band few-diagonal FEM class (pwtk: 192 element diagonals
# over a +-2729 halfband — the row-aligned band would be a 4.8 GB slab)
# where mm otherwise fell to the gather engine (~400 ms at K=64 on the
# pwtk stand-in). Reference role: csrmm over the DIA-optimized format
# (level3/aoclsparse_csrmm.hpp row loop; format from csr2dia,
# conversion/aoclsparse_convert.cpp:506).
# ---------------------------------------------------------------------------


def _kernel_stream_read(b_ref, o_ref):
    o_ref[:] = jnp.full((8, 128), jnp.sum(b_ref[:]), o_ref.dtype)


@partial(jax.jit, static_argnames=("TM", "interpret"))
def pallas_stream_read(v, TM: int = 2048, interpret: bool = False):
    """HBM streaming-read rate probe: reduce a (R, C) slab tile-by-tile
    through VMEM with the same grid pipeline as the band kernels. Exists
    because an XLA fori-loop reduce over the same array measures ~30-50%
    BELOW what the Pallas band kernels actually stream (bench r5: XLA sum
    192 GB/s vs 402 GB/s actual kernel traffic on the same hot pages) —
    so it, not a fused reduce, is the honest achievable-bandwidth
    calibrator for vs_achievable (VERDICT r4 item 2)."""
    R, C = v.shape
    ntile = -(-C // TM)
    if ntile * TM != C:
        v = jnp.pad(v, ((0, 0), (0, ntile * TM - C)))
    out = pl.pallas_call(
        _kernel_stream_read,
        out_shape=jax.ShapeDtypeStruct((ntile * 8, 128), jnp.float32),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((R, TM), _imap32(lambda t: (0, t)), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((8, 128), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v)
    return out[::8, 0].sum()


def _kernel_mm_diag(dv_ref, *b_and_out, TMl: int, offs_rel: tuple):
    """Ct[k, i] = sum_j dv[j, i] * Bt[k, i + off_j] for a TMl-lane tile.

    dv: (D8, TMl) diagonal values (row j = diagonal j, lanes = matrix
    rows); Bt window arrives as nsl consecutive (K8, TMl) blocks stitched
    lane-wise. Per-diagonal slices of the window are unaligned LANE
    slices (legal); the per-diagonal value row dv[j] would be an
    unaligned SUBLANE slice, so it is extracted with an aligned 8-row
    one-hot reduction instead (8 extra VPU mults per diagonal — noise
    next to the K8-wide FMA)."""
    b_refs = b_and_out[:-1]
    out_ref = b_and_out[-1]
    Bcat = jnp.concatenate([r[:] for r in b_refs], axis=1)  # (K8, nsl*TMl)
    K8 = out_ref.shape[0]
    # one-hot sublane selector built from iota IN-KERNEL (pallas_call
    # rejects captured constants)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    # accumulate through out_ref in chunks of 8 diagonals: a single acc
    # chain keeps EVERY window slice live on the Mosaic VMEM stack (103
    # diagonals x (64, 2048) slices = 41.5 MB > the 16 MB scoped limit,
    # measured on pwtk at K=64); the staged writes bound liveness at 8
    acc = None
    for j, off in enumerate(offs_rel):
        a8, r = (j // 8) * 8, j % 8
        sel = (row_id == np.int32(r)).astype(out_ref.dtype)
        dvj = jnp.sum(
            dv_ref[a8 : a8 + 8, :].astype(out_ref.dtype) * sel,
            axis=0,
            keepdims=True,
        )  # (1, TMl)
        win = jax.lax.slice(Bcat, (0, off), (K8, off + TMl))
        term = dvj * win.astype(out_ref.dtype)
        acc = term if acc is None else acc + term
        if (j + 1) % 8 == 0 or j + 1 == len(offs_rel):
            if j < 8:
                out_ref[:] = acc
            else:
                out_ref[:] = out_ref[:] + acc
            acc = None


def diagmm_tiles(span: int, K8: int, D8: int, vmem_budget: int = 10 * 2**20):
    """Pick TMl (lane tile) so the kernel's VMEM footprint — dv (D8, TMl)
    + nsl B blocks (K8, TMl) + out (K8, TMl), double-buffered — fits the
    budget. Returns (TMl, nsl) or None when no tile fits (span too wide:
    ldoor-class; the caller falls back to the XLA unrolled slices)."""
    for TMl in (2048, 4096, 1024, 8192):
        nsl = -(-(span + TMl) // TMl)
        # blocks (double-buffered) + the 8-deep live window chain of the
        # staged accumulation (see _kernel_mm_diag)
        byt = (D8 * TMl + nsl * K8 * TMl + K8 * TMl) * 4 * 2 + 8 * K8 * TMl * 4
        if byt <= vmem_budget:
            return TMl, nsl
    return None


@partial(jax.jit, static_argnames=("offs", "m", "L", "n_pad", "TMl", "interpret"))
def pallas_spmm_diag(
    dvals, B, offs: tuple, m: int, L: int, n_pad: int, TMl: int = 2048,
    interpret: bool = False,
):
    """C = A_dia @ B for the planner's diag execution form.

    dvals: (ndiag, m) diagonal-aligned values (dia_val layout: diagonal d's
    entry for row i at dvals[d, i], column i + offs[d]); B: (n, K) dense.
    Matches spmv_diag semantics with a matrix RHS; dvals may be bf16
    (f32 accumulate, docs/precision.md)."""
    ndiag = len(offs)
    K = B.shape[1]
    K8 = -(-K // 8) * 8
    D8 = -(-ndiag // 8) * 8
    dv = dvals
    if D8 != ndiag:
        dv = jnp.pad(dv, ((0, D8 - ndiag), (0, 0)))
    ntile = -(-m // TMl)
    m_pad = ntile * TMl
    if m_pad != m:
        dv = jnp.pad(dv, ((0, 0), (0, m_pad - m)))
    off_min = min(offs)
    span = max(offs) - off_min
    start0 = off_min + L
    Bp = jnp.pad(B, ((L, n_pad - L - B.shape[0]), (0, K8 - K)))
    Bt = Bp.T  # (K8, n_pad)
    coarse, rem = divmod(start0, TMl)
    nsl = -(-(span + TMl) // TMl)
    need = (ntile + coarse + nsl) * TMl + rem
    if Bt.shape[1] < need:
        Bt = jnp.pad(Bt, ((0, 0), (0, need - Bt.shape[1])))
    if rem:
        Bt = jnp.roll(Bt, -rem, axis=1)
    ncol = Bt.shape[1] // TMl
    Bt = Bt[:, : ncol * TMl]
    offs_rel = tuple(int(o) - off_min for o in offs)
    in_specs = [
        pl.BlockSpec((D8, TMl), _imap32(lambda t: (0, t)), memory_space=pltpu.VMEM)
    ]
    for i in range(nsl):
        in_specs.append(
            pl.BlockSpec(
                (K8, TMl),
                _imap32(lambda t, i=i: (0, t + coarse + i)),
                memory_space=pltpu.VMEM,
            )
        )
    odt = jnp.float32 if dv.dtype == jnp.bfloat16 else dv.dtype
    out = pl.pallas_call(
        partial(_kernel_mm_diag, TMl=TMl, offs_rel=offs_rel),
        out_shape=jax.ShapeDtypeStruct((K8, m_pad), odt),
        grid=(ntile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((K8, TMl), _imap32(lambda t: (0, t)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dv, *([Bt] * nsl))
    return out[:K, :m].T


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
            pl.BlockSpec((W, TM), _imap32(lambda t: (0, t)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM // 8), _imap32(lambda t: (t + coarse, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM // 8), _imap32(lambda t: (t + coarse + 1, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TM // 8), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vt, x2, x2)
    return out.reshape(-1)[:m]


def _kernel_t_v(vt4_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int):
    """Vertical-layout band SpMV tile: y[i] = sum_j vt[j, i] * xwin[i + j].

    The v2 kernel's (1, TM) FMA chain uses one sublane of each VPU tile
    (1/8 of the ALUs). Here the band arrives PRE-TRANSFORMED to the
    output's natural (8, TM/8) sublane distribution (band_vert_layout):
    row (j*8 + s) of the block holds vt[j, ...] for output sublane s, so
    each j is one full-tile (8, TM/8) FMA straight into the accumulator —
    no reduction, no relayout, all 8 sublanes live. The SUB shifted x
    copies come from ONE strided roll (a sublane-concat of
    differently-offset lane slices is not lowerable: mixed vpad offsets).
    A bf16 band upcasts per PAIR of j's (one full 16-sublane bf16 tile;
    the round-2 per-slice astype relayout disappears)."""
    TMd8 = TM // 8
    # The x chunks are (8, TM/8) tiles whose sublane s holds
    # xe[chunk*TM + s*TM/8 + c] — already the output tile's sublane
    # distribution. Build base[s, i] = xwin[s*TM/8 + i] for
    # i < nslab*TM/8 by lane-concatenating sublane-rolled copies of the
    # 16-row chunk pair (PLAIN rolls only: pltpu.roll's strided form
    # miscompiles when row*stride exceeds the axis size — compiled
    # results diverge from interpret mode, measured on v5e).
    xcat = jnp.concatenate([x0_ref[:], x1_ref[:]], axis=0)  # (16, TM/8)
    nslab = 1 + -(-(W - 1) // TMd8)  # covers lane index j + c <= W-1 + TM/8-1
    slabs = [xcat[0:8]]
    for k in range(1, nslab):
        # shift must be i32: under jax_enable_x64 a Python int traces as an
        # i64 scalar and tpu.dynamic_rotate rejects 64-bit operands
        slabs.append(pltpu.roll(xcat, np.int32(16 - k), 0)[0:8])  # rows k..k+7
    base = jnp.concatenate(slabs, axis=1)  # (8, nslab*TM/8)
    acc = jnp.zeros((8, TMd8), dtype=out_ref.dtype)
    if vt4_ref.dtype == jnp.bfloat16:
        for j0 in range(0, W, 2):
            pair = vt4_ref[j0 * 8 : j0 * 8 + 16, :].astype(out_ref.dtype)
            acc = acc + pair[0:8] * base[:, j0 : j0 + TMd8]
            acc = acc + pair[8:16] * base[:, j0 + 1 : j0 + 1 + TMd8]
    else:
        for j in range(W):
            acc = acc + vt4_ref[j * 8 : j * 8 + 8, :] * base[:, j : j + TMd8]
    out_ref[:] = acc


def band_vert_layout(vt, TM: int):
    """Pre-transform a (W, m) transposed band for pallas_spmv_band_v:
    returns (W*8, ntile*TM/8) with row (j*8 + s), column (t*TM/8 + c)
    holding vt[j, t*TM + s*TM/8 + c]. Accepts numpy or jax arrays (done
    once at plan/cache build, not per dispatch)."""
    xp = np if isinstance(vt, np.ndarray) else jnp
    W, m = vt.shape
    ntile = -(-m // TM)
    if ntile * TM != m:
        vt = xp.pad(vt, ((0, 0), (0, ntile * TM - m)))
    v = vt.reshape(W, ntile, 8, TM // 8).transpose(0, 2, 1, 3)
    return v.reshape(W * 8, ntile * (TM // 8))


@partial(jax.jit, static_argnames=("W", "start", "TM", "interpret"))
def pallas_spmv_band_v(vt4, xe, W: int, start: int, TM: int = 2048, interpret: bool = False):
    """Vertical-layout row-aligned band SpMV (same math contract as
    pallas_spmv_band_t, but the band must be pre-transformed with
    band_vert_layout(vt, TM)). vt4 may be bf16 (W even; per-pair
    whole-tile upcast, f32 accumulate) or f32. Requires W <= TM, and
    TM >= 1024 for compiled runs (the band block's lane dim is TM/8,
    which Mosaic requires to be a 128-multiple; interpret-mode tests may
    use smaller tiles)."""
    W8, mcols = vt4.shape
    assert W8 == W * 8 and W <= TM
    if vt4.dtype == jnp.bfloat16:
        assert W % 2 == 0, "bf16 vertical band needs even W (pad a zero row)"
    TMd8 = TM // 8
    ntile = mcols // TMd8
    m = ntile * TM
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if xe.shape[0] < need:
        xe = jnp.pad(xe, (0, need - xe.shape[0]))
    if rem:
        xe = jnp.roll(xe, -rem)
    nchunk = xe.shape[0] // TM
    x2 = xe[: nchunk * TM].reshape(nchunk * 8, TMd8)
    odt = jnp.float32 if vt4.dtype == jnp.bfloat16 else vt4.dtype

    out = pl.pallas_call(
        partial(_kernel_t_v, TM=TM, W=W),
        out_shape=jax.ShapeDtypeStruct((ntile * 8, TMd8), odt),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((W * 8, TMd8), _imap32(lambda t: (0, t)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TMd8), _imap32(lambda t: (t + coarse, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TMd8), _imap32(lambda t: (t + coarse + 1, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TMd8), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vt4, x2, x2)
    return out.reshape(-1)[:m]


def band_vert_layout_tiles(vt, TM: int):
    """Tile-major variant of band_vert_layout: returns (ntile, W*8, TM/8)
    where tile t is the CONTIGUOUS band slab of grid step t. The flat
    band_vert_layout holds tile t as a (W*8, TM/8) column block of a
    (W*8, ntile*TM/8) array — every DMA'd block row is then a TM/8*itemsize
    (~4 KB) segment strided by the full row pitch, which the DMA engine
    streams at roughly half rate (measured on v5e, PROBE_r4 bandv_c vs
    bandv_base). Tile-major makes each grid step's block one contiguous
    W*TM*itemsize run."""
    xp = np if isinstance(vt, np.ndarray) else jnp
    W, m = vt.shape
    ntile = -(-m // TM)
    if ntile * TM != m:
        vt = xp.pad(vt, ((0, 0), (0, ntile * TM - m)))
    # (W, ntile, 8, TM/8) -> (ntile, W, 8, TM/8) -> (ntile, W*8, TM/8)
    v = vt.reshape(W, ntile, 8, TM // 8).transpose(1, 0, 2, 3)
    return v.reshape(ntile, W * 8, TM // 8)


def _kernel_t_vc(vt3_ref, x0_ref, x1_ref, out_ref, *, TM: int, W: int):
    """Same math as _kernel_t_v; band block arrives as (1, W*8, TM/8)
    tile-major (contiguous DMA)."""
    TMd8 = TM // 8
    xcat = jnp.concatenate([x0_ref[:], x1_ref[:]], axis=0)  # (16, TM/8)
    nslab = 1 + -(-(W - 1) // TMd8)
    slabs = [xcat[0:8]]
    for k in range(1, nslab):
        slabs.append(pltpu.roll(xcat, np.int32(16 - k), 0)[0:8])
    base = jnp.concatenate(slabs, axis=1)  # (8, nslab*TM/8)
    acc = jnp.zeros((8, TMd8), dtype=out_ref.dtype)
    if vt3_ref.dtype == jnp.bfloat16:
        for j0 in range(0, W, 2):
            pair = vt3_ref[0, j0 * 8 : j0 * 8 + 16, :].astype(out_ref.dtype)
            acc = acc + pair[0:8] * base[:, j0 : j0 + TMd8]
            acc = acc + pair[8:16] * base[:, j0 + 1 : j0 + 1 + TMd8]
    else:
        for j in range(W):
            acc = acc + vt3_ref[0, j * 8 : j * 8 + 8, :] * base[:, j : j + TMd8]
    out_ref[:] = acc


@partial(jax.jit, static_argnames=("W", "start", "TM", "interpret"))
def pallas_spmv_band_vc(vt3, xe, W: int, start: int, TM: int = 8192, interpret: bool = False):
    """Contiguous-tile vertical-layout band SpMV: math contract of
    pallas_spmv_band_v, band pre-transformed with band_vert_layout_tiles
    (tile-major, so each grid step's band DMA is one contiguous slab)."""
    ntile, W8, TMd8 = vt3.shape
    assert W8 == W * 8 and TMd8 == TM // 8 and W <= TM
    m = ntile * TM
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if xe.shape[0] < need:
        xe = jnp.pad(xe, (0, need - xe.shape[0]))
    if rem:
        xe = jnp.roll(xe, -rem)
    nchunk = xe.shape[0] // TM
    x2 = xe[: nchunk * TM].reshape(nchunk * 8, TMd8)
    odt = jnp.float32 if vt3.dtype == jnp.bfloat16 else vt3.dtype

    out = pl.pallas_call(
        partial(_kernel_t_vc, TM=TM, W=W),
        out_shape=jax.ShapeDtypeStruct((ntile * 8, TMd8), odt),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, W8, TMd8), _imap32(lambda t: (t, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TMd8), _imap32(lambda t: (t + coarse, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TMd8), _imap32(lambda t: (t + coarse + 1, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TMd8), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vt3, x2, x2)
    return out.reshape(-1)[:m]


def _kernel_t_vd(x_ref, vt_hbm, out_ref, *, TM: int, W: int, NT: int, coarse: int):
    """Single-grid-step band SpMV: the band stays in HBM and is streamed
    tile-by-tile with a manually double-buffered async DMA (guide pattern),
    x and y live wholly in VMEM. Removes ALL per-grid-step pipeline
    machinery — the only steady-state costs are the 2-deep contiguous slab
    DMA and the W-FMA chain per tile."""
    TMd8 = TM // 8
    nslab = 1 + -(-(W - 1) // TMd8)

    def body(scratch, sem):
        def dma(slot, t):
            return pltpu.make_async_copy(vt_hbm.at[t], scratch.at[slot], sem.at[slot])

        dma(0, 0).start()

        def loop(t, carry):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < NT)
            def _():
                dma((t + 1) % 2, t + 1).start()

            dma(slot, t).wait()
            r0 = pl.multiple_of(8 * (t + np.int32(coarse)), 8)
            xcat = x_ref[pl.ds(r0, 16), :]  # (16, TM/8)
            slabs = [xcat[0:8]]
            for k in range(1, nslab):
                slabs.append(pltpu.roll(xcat, np.int32(16 - k), 0)[0:8])
            base = jnp.concatenate(slabs, axis=1)
            acc = jnp.zeros((8, TMd8), dtype=out_ref.dtype)
            if vt_hbm.dtype == jnp.bfloat16:
                for j0 in range(0, W, 2):
                    pair = scratch[slot, j0 * 8 : j0 * 8 + 16, :].astype(out_ref.dtype)
                    acc = acc + pair[0:8] * base[:, j0 : j0 + TMd8]
                    acc = acc + pair[8:16] * base[:, j0 + 1 : j0 + 1 + TMd8]
            else:
                for j in range(W):
                    acc = acc + scratch[slot, j * 8 : j * 8 + 8, :] * base[:, j : j + TMd8]
            out_ref[pl.ds(pl.multiple_of(8 * t, 8), 8), :] = acc
            return carry

        jax.lax.fori_loop(0, NT, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, W * 8, TMd8), vt_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@partial(jax.jit, static_argnames=("W", "start", "TM", "interpret"))
def pallas_spmv_band_vd(vt3, xe, W: int, start: int, TM: int = 8192, interpret: bool = False):
    """Manual-DMA vertical-layout band SpMV: math contract of
    pallas_spmv_band_v on the band_vert_layout_tiles operand, single grid
    step, band double-buffered from HBM inside the kernel."""
    ntile, W8, TMd8 = vt3.shape
    assert W8 == W * 8 and TMd8 == TM // 8 and W <= TM
    m = ntile * TM
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if xe.shape[0] < need:
        xe = jnp.pad(xe, (0, need - xe.shape[0]))
    if rem:
        xe = jnp.roll(xe, -rem)
    nchunk = xe.shape[0] // TM
    x2 = xe[: nchunk * TM].reshape(nchunk * 8, TMd8)
    odt = jnp.float32 if vt3.dtype == jnp.bfloat16 else vt3.dtype

    out = pl.pallas_call(
        partial(_kernel_t_vd, TM=TM, W=W, NT=ntile, coarse=coarse),
        out_shape=jax.ShapeDtypeStruct((ntile * 8, TMd8), odt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x wholly resident
            pl.BlockSpec(memory_space=pltpu.ANY),  # band stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, vt3)
    return out.reshape(-1)[:m]


# ---------------------------------------------------------------------------
# double-float (two-f32) band SpMV: f64-class accuracy at VPU f32 rates
# ---------------------------------------------------------------------------


def _df_split(a):
    """Dekker split of an f32 vector into 12+12-bit halves (factor 2^12+1):
    products of halves are then EXACT in f32, which is what makes the
    two_prod error term below error-free without hardware FMA semantics.
    Valid for |a| < 2^115 (the 4097*a intermediate must not overflow)."""
    c = a * 4097.0
    hi = c - (c - a)
    return hi, a - hi


def _kernel_t_v_df(
    vh_ref, vl_ref, x0h_ref, x1h_ref, x0l_ref, x1l_ref, oh_ref, ol_ref, *, TM: int, W: int
):
    """Vertical-layout band SpMV tile in DOUBLE-FLOAT arithmetic.

    Operands arrive as (hi, lo) f32 pairs (value = hi + lo, built by
    ExecForm.bandt_vertical_df / the x split in spmv_bandv_df); the
    accumulator is a double-float pair carrying ~49 mantissa bits. Per band
    row j: an error-free two-product of the hi parts (Dekker split — every
    half-product is exact in f32, no FMA contract assumed), the first-order
    cross terms vh*xl + vl*xh (the dropped vl*xl term is O(2^-48) relative),
    then a sloppy two-sum accumulate. ~25 VPU ops per element vs 2 for f32:
    still far under this kernel's HBM-bound ratio, so the cost over f32 is
    ~2x (the doubled band bytes), not ~16x like XLA's emulated f64
    (benchmarks/RESULTS_r2.md measured 3.4 vs 42.7 GB/s eff same-window).

    Reference parity: serves aoclsparse_dmv's double-precision semantics
    within the reference's own f64 test tolerance (expected_precision ~
    2.1e-8 scale, aoclsparse_utils.hpp:493-498) with ~5 decimal digits of
    headroom; docs/precision.md documents the 2^-48 error model.
    """
    TMd8 = TM // 8

    def window(x0, x1):
        xcat = jnp.concatenate([x0[:], x1[:]], axis=0)  # (16, TM/8)
        nslab = 1 + -(-(W - 1) // TMd8)
        slabs = [xcat[0:8]]
        for k in range(1, nslab):
            # i32 shift: x64 tracing makes a Python int an i64 scalar, which
            # tpu.dynamic_rotate rejects (measured on v5e; SUITE_r3a df64 row)
            slabs.append(pltpu.roll(xcat, np.int32(16 - k), 0)[0:8])
        return jnp.concatenate(slabs, axis=1)  # (8, nslab*TM/8)

    baseh = window(x0h_ref, x1h_ref)
    basel = window(x0l_ref, x1l_ref)
    bhh, bhl = _df_split(baseh)  # split the x hi-part once, reused for all j
    acch = jnp.zeros((8, TMd8), jnp.float32)
    accl = jnp.zeros((8, TMd8), jnp.float32)
    for j in range(W):
        vh = vh_ref[j * 8 : j * 8 + 8, :]
        vl = vl_ref[j * 8 : j * 8 + 8, :]
        xh = baseh[:, j : j + TMd8]
        xl = basel[:, j : j + TMd8]
        xhh = bhh[:, j : j + TMd8]
        xhl = bhl[:, j : j + TMd8]
        ah, al = _df_split(vh)
        p = vh * xh
        # exact f32 error of p (Dekker two-product via split halves)
        e = ((ah * xhh - p) + ah * xhl + al * xhh) + al * xhl
        # first-order cross terms of (vh+vl)(xh+xl)
        e = e + vh * xl + vl * xh
        # sloppy double-float accumulate: (acch, accl) += (p, e)
        s = acch + p
        d = s - acch
        err = (acch - (s - d)) + (p - d)
        err = err + accl + e
        acch = s + err
        accl = err - (acch - s)
    oh_ref[:] = acch
    ol_ref[:] = accl


@partial(jax.jit, static_argnames=("W", "start", "TM", "interpret"))
def pallas_spmv_band_v_df(
    vt4h, vt4l, xeh, xel, W: int, start: int, TM: int = 2048, interpret: bool = False
):
    """Double-float vertical-layout band SpMV: same contract/layout as
    pallas_spmv_band_v but operands are (hi, lo) f32 pairs and the result is
    the (yh, yl) pair (caller combines in f64). vt4h/vt4l built by
    band_vert_layout from the split f64 band."""
    W8, mcols = vt4h.shape
    assert W8 == W * 8 and W <= TM and vt4l.shape == vt4h.shape
    TMd8 = TM // 8
    ntile = mcols // TMd8
    m = ntile * TM
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if xeh.shape[0] < need:
        xeh = jnp.pad(xeh, (0, need - xeh.shape[0]))
        xel = jnp.pad(xel, (0, need - xel.shape[0]))
    if rem:
        xeh = jnp.roll(xeh, -rem)
        xel = jnp.roll(xel, -rem)
    nchunk = xeh.shape[0] // TM
    x2h = xeh[: nchunk * TM].reshape(nchunk * 8, TMd8)
    x2l = xel[: nchunk * TM].reshape(nchunk * 8, TMd8)

    # index-map returns pinned to i32: this wrapper is traced under
    # jax_enable_x64 (f64 operands), where Python-int constants become i64
    # and Mosaic fails to legalize the index-map 'func.return' (measured on
    # v5e; the in-kernel analog is the np.int32 roll shift above)
    _0 = np.int32(0)
    xspec = lambda off: pl.BlockSpec(  # noqa: E731
        (8, TMd8),
        lambda t, off=np.int32(coarse + off): (t + off, _0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        partial(_kernel_t_v_df, TM=TM, W=W),
        out_shape=(
            jax.ShapeDtypeStruct((ntile * 8, TMd8), jnp.float32),
            jax.ShapeDtypeStruct((ntile * 8, TMd8), jnp.float32),
        ),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((W * 8, TMd8), _imap32(lambda t: (_0, t)), memory_space=pltpu.VMEM),
            pl.BlockSpec((W * 8, TMd8), _imap32(lambda t: (_0, t)), memory_space=pltpu.VMEM),
            xspec(0),
            xspec(1),
            xspec(0),
            xspec(1),
        ],
        out_specs=(
            pl.BlockSpec((8, TMd8), _imap32(lambda t: (t, _0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TMd8), _imap32(lambda t: (t, _0)), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(vt4h, vt4l, x2h, x2h, x2l, x2l)
    yh, yl = outs
    return yh.reshape(-1)[:m], yl.reshape(-1)[:m]


@partial(
    jax.jit,
    static_argnames=("m", "W", "padL", "start", "TM", "interpret", "has_spill"),
)
def spmv_bandv_df(
    vt4h,
    vt4l,
    x,
    sp_val,
    sp_ind,
    sp_rows,
    m: int,
    W: int,
    padL: int,
    start: int,
    TM: int = 2048,
    interpret: bool = False,
    has_spill: bool = False,
):
    """Full double-float band dispatch (mv KID 13): split the f64 x into an
    (hi, lo) f32 pair, run the df64 vertical-layout kernel on the pre-split
    band, recombine in f64, add the planner's peel spill (native f64 — the
    spill is O(nnz/100)) — one compiled program. Same math contract as
    spmv_bandv at ~2^-48 relative accuracy (docs/precision.md)."""
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(x.dtype)).astype(jnp.float32)
    xeh = jnp.pad(xh, (padL, 0))
    xel = jnp.pad(xl, (padL, 0))
    yh, yl = pallas_spmv_band_v_df(vt4h, vt4l, xeh, xel, W, start, TM=TM, interpret=interpret)
    y = yh[:m].astype(x.dtype) + yl[:m].astype(x.dtype)
    if has_spill:
        y = y + jax.ops.segment_sum(
            sp_val * x[sp_ind], sp_rows, num_segments=m, indices_are_sorted=True
        )
    return y


def _kernel_mxu(dt_ref, x0_ref, x1_ref, out_ref, *, TM: int, NB: int):
    """MXU block-window band SpMV tile: NB row-blocks of 128, each a
    (1, 256) x-window slice times a pre-transposed (256, 128) dense window
    block — lane-major in and out, so the only non-MXU work is the final
    (NB, 128) concat. Trades 2x band bytes for MXU execution (the VPU
    FMA-chain kernels top out near ~190 GB/s effective)."""
    xwin = jnp.concatenate(
        [x0_ref[:].reshape(1, TM), x1_ref[:].reshape(1, TM)], axis=1
    )  # (1, 2*TM) f32
    # f32 blocks need full-precision dots: the TPU matmul default rounds
    # operands to bf16 passes (measured relerr ~2.5e-3 on the f32 form)
    prec = None if dt_ref.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    ys = []
    for q in range(NB):
        xq = xwin[:, 128 * q : 128 * q + 256].astype(dt_ref.dtype)  # (1, 256)
        ys.append(
            jnp.dot(
                xq, dt_ref[q], preferred_element_type=out_ref.dtype, precision=prec
            )
        )  # (1, 128)
    out_ref[:] = jnp.concatenate(ys, axis=0)  # (NB, 128)


@partial(jax.jit, static_argnames=("start", "TM", "interpret"))
def pallas_spmv_band_mxu(dt, xe, start: int, TM: int = 1024, interpret: bool = False):
    """Block-window band SpMV: y[128k+s] = sum_c dt[k, c, s] * xe[start+128k+c].

    dt: (nblk, 256, 128) pre-transposed dense window blocks built by the
    planner from the row-aligned band (dt[k, c, s] = A[128k+s, ...] with the
    window of block k starting at xe[start + 128k]); supports W <= 129.
    dt may be bf16 (x slices cast to bf16, f32 accumulate via the MXU's
    native mixed precision). TM must be a multiple of 128."""
    nblk = dt.shape[0]
    m = nblk * 128
    assert TM % 128 == 0
    NB = TM // 128
    ntile = -(-nblk // NB)
    if ntile * NB != nblk:
        dt = jnp.pad(dt, ((0, ntile * NB - nblk), (0, 0), (0, 0)))
    coarse, rem = divmod(start, TM)
    need = (ntile + coarse + 2) * TM + rem
    if xe.shape[0] < need:
        xe = jnp.pad(xe, (0, need - xe.shape[0]))
    if rem:
        xe = jnp.roll(xe, -rem)
    nchunk = xe.shape[0] // TM
    x2 = xe[: nchunk * TM].reshape(nchunk * 8, TM // 8)
    odt = jnp.float32 if dt.dtype == jnp.bfloat16 else dt.dtype

    out = pl.pallas_call(
        partial(_kernel_mxu, TM=TM, NB=NB),
        out_shape=jax.ShapeDtypeStruct((ntile * NB, 128), odt),
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((NB, 256, 128), _imap32(lambda t: (t, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM // 8), _imap32(lambda t: (t + coarse, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM // 8), _imap32(lambda t: (t + coarse + 1, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NB, 128), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dt, x2, x2)
    return out.reshape(-1)[:m]


def band_mxu_blocks(vt: np.ndarray, W: int) -> np.ndarray:
    """Host-side: build the (nblk, 256, 128) pre-transposed window blocks for
    pallas_spmv_band_mxu from a (W, m) transposed row-aligned band
    (vt[j, i] = A-band entry j of row i; W <= 129). Window of block k covers
    xe offsets [start + 128k, start + 128k + 256): row i = 128k+s reads
    offsets s+j, so D[k, s, s+j] = vt[j, i]."""
    Wm, m = vt.shape
    assert Wm == W and W <= 129
    nblk = -(-m // 128)
    m_pad = nblk * 128
    if m_pad != m:
        vt = np.pad(vt, ((0, 0), (0, m_pad - m)))
    D = np.zeros((m_pad, 256), dtype=vt.dtype)
    rows = np.arange(m_pad)
    s = rows % 128
    D[rows[:, None], s[:, None] + np.arange(W)[None, :]] = vt.T
    return np.ascontiguousarray(D.reshape(nblk, 128, 256).transpose(0, 2, 1))


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
            pl.BlockSpec((TM, W), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TM // 8), _imap32(lambda t: (t + coarse, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, TM // 8), _imap32(lambda t: (t + coarse + 1, 0, 0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TM // 8, 8), _imap32(lambda t: (t, 0)), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v2, x3, x3)
    return out.reshape(-1)[:m_rows]
