"""SpMV compute kernels (XLA path).

TPU-native redesign of the reference's SpMV kernel zoo
(level2/aoclsparse_csrmv_kt.cpp:31-108, csrmv_kr.hpp:450, blkcsrmv_avx512.cpp,
ellmv.hpp, diamv.hpp, bsrmv.cpp). Where the reference vectorizes each row over
AVX lanes with gather+FMA+hsum, the TPU formulation makes every operand a
statically-shaped dense array so XLA can tile it over the VPU/MXU:

- ``spmv_segsum``     COO-flavored: one gather of x, elementwise multiply,
                      segment-sum by row id. Works for any CSR via precomputed
                      row ids; the general-purpose fallback.
- ``spmv_ell``        padded-row gather kernel: (m, w) gather + masked
                      multiply + row reduce. The analog of the reference's
                      ELL/BLKCSR/BR4 lane-blocked layouts.
- ``spmv_ellhyb``     ELL head + COO spill (ellthybmv analog).
- ``spmv_bsr``        dense (bs, bs) blocks ride batched matmul (MXU).
- ``spmv_dia``        per-diagonal shifted multiply (diamv analog).

All kernels are pure functions of arrays (jit-cached by shape); structure
arrays (row ids, padding maps) are built host-side by the planner once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "csr_row_ids",
    "spmv_segsum",
    "spmv_sell",
    "spmv_ell",
    "spmv_ellhyb",
    "spmv_bsr",
    "spmv_dia",
    "spmv_bwdg",
    "spmv_csr_dense_ref",
]


def csr_row_ids(ptr) -> np.ndarray:
    """Host-side: expand CSR ptr to per-nnz row ids (int32)."""
    ptr = np.asarray(ptr)
    return np.repeat(np.arange(ptr.size - 1, dtype=np.int32), np.diff(ptr))


@partial(jax.jit, static_argnames=("m",))
def spmv_segsum(ind, val, row_ids, x, m: int):
    """y = A @ x via gather + segment-sum. `row_ids` must be sorted
    (CSR order), letting XLA use the scan-based segment-sum lowering."""
    prods = val * x[ind]
    return jax.ops.segment_sum(prods, row_ids, num_segments=m, indices_are_sorted=True)


@partial(jax.jit, static_argnames=("m",))
def spmv_sell(ind, val, row_ids, x, m: int):
    """y = A @ x over the flattened sliced-ELL layout (core/formats.py SELL):
    8-row slices each padded to a lane-multiple width. Padding entries carry
    val == 0 and an in-range column, so unlike spmv_ell no validity mask is
    needed, and unlike spmv_segsum the buffer is tile-aligned per slice.
    `row_ids` are the precomputed per-entry destination rows (sorted — slice
    layout is row-major). Plays the reference's BLKCSR/BR4 dispatch role
    (aoclsparse_analysis.cpp:35-385) as an explicit-KID alternative form."""
    prods = val * x[ind]
    return jax.ops.segment_sum(prods, row_ids, num_segments=m, indices_are_sorted=True)


@jax.jit
def spmv_ell(ind, val, x):
    """y = A @ x over padded rows: ind/val are (m, w), padding ind == -1.

    One big gather (memory-bound, matching SpMV's roofline), masked multiply,
    row-sum — everything statically shaped for the VPU.
    """
    gathered = jnp.take(x, jnp.maximum(ind, 0), axis=0)
    prods = jnp.where(ind >= 0, val * gathered, jnp.zeros((), dtype=val.dtype))
    return jnp.sum(prods, axis=1)


@partial(jax.jit, static_argnames=("m",))
def spmv_ellhyb(ell_ind, ell_val, sp_ind, sp_val, sp_rows, x, m: int):
    """Hybrid: ELL head + COO spill segment-sum (ellthybmv analog)."""
    y = spmv_ell(ell_ind, ell_val, x)
    if sp_ind.shape[0]:
        y = y + jax.ops.segment_sum(
            sp_val * x[sp_ind], sp_rows, num_segments=m, indices_are_sorted=True
        )
    return y


@partial(jax.jit, static_argnames=("mb", "block_dim"))
def spmv_bsr(ptr_rows, ind, val, x, mb: int, block_dim: int):
    """BSR SpMV: gather x blocks then batched block matvec + block-row
    segment-sum. `ptr_rows` is per-block block-row ids (host-precomputed).
    Dense (bs, bs) blocks multiply on the MXU when bs is large enough;
    bsrmv analog (level2/aoclsparse_bsrmv.cpp:179)."""
    bs = block_dim
    n_pad = x.shape[0]
    # gather the x block for each stored block: (nnzb, bs)
    xb = x[(ind[:, None] * bs + jnp.arange(bs)[None, :]).reshape(-1)].reshape(-1, bs)
    # (nnzb, bs, bs) @ (nnzb, bs) -> (nnzb, bs)
    prod = jnp.einsum("krc,kc->kr", val, xb, preferred_element_type=val.dtype)
    yb = jax.ops.segment_sum(prod, ptr_rows, num_segments=mb, indices_are_sorted=True)
    return yb.reshape(mb * bs)


def spmv_dia(dist: tuple, val, x, m: int, n: int):
    """DIA SpMV: ndiag static shifted multiplies (diamv analog). `dist` is a
    static tuple so the loop unrolls at trace time into fused VPU ops."""

    @partial(jax.jit, static_argnames=("dist", "m", "n"))
    def _run(val, x, dist, m, n):
        y = jnp.zeros((m,), dtype=val.dtype)
        rows = jnp.arange(m)
        for k, d in enumerate(dist):
            cols = rows + d
            ok = (cols >= 0) & (cols < n)
            xg = x[jnp.clip(cols, 0, n - 1)]
            y = y + jnp.where(ok, val[k] * xg, jnp.zeros((), dtype=val.dtype))
        return y

    return _run(val, x, tuple(int(d) for d in dist), m, n)


@partial(jax.jit, static_argnames=("W", "base8", "n_pad", "mixed"))
def spmv_bwd(win_val, x, W: int, base8: int, n_pad: int, mixed: bool = False):
    """Banded-window dense SpMV — the TPU speed-of-light path.

    TPU-native replacement for the reference's AVX-blocked formats
    (BLKCSR/BR4, aoclsparse_analysis.cpp:35-385): instead of gather-based
    lane blocking (gathers are catastrophically slow on TPU — measured
    ~0.2 G elem/s vs ~100 G elem/s for contiguous streams), the planner
    materializes each 8-row block's band window densely:

        win_val: (nblk, 8, W) with win_val[b, r, t] = A[8b+r, 8b*?+rel]
        window of block b covers columns [8*(b + base8') .. +W)

    and the kernel is ONE batched matvec over statically-sliced x windows —
    zero gathers, einsum rides the MXU, traffic = m*W values (the planner
    bounds the blowup m*W/nnz before choosing this form).

    x is pre-padded to n_pad (multiple of 8, covering every window);
    `base8` is the first block's window start in 8-element units into the
    padded x. With mixed=True the multiply runs in bfloat16 with f32
    accumulation (TPU mixed-precision option; off for parity tests).
    """
    nblk = win_val.shape[0]
    xr = x.reshape(-1, 8)  # (n_pad/8, 8)
    pats = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xr, base8 + j, nblk, 0) for j in range(W // 8)],
        axis=1,
    )  # (nblk, W)
    if mixed:
        out = jnp.einsum(
            "brw,bw->br",
            win_val.astype(jnp.bfloat16),
            pats.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(win_val.dtype)
    else:
        out = jnp.einsum("brw,bw->br", win_val, pats)
    return out.reshape(-1)


def _split3_exact(x):
    """Bit-masked 3-way split of f32 into bf16-exact pieces: h1 is the
    bf16 truncation (top 16 bits of the f32 representation ARE a bf16),
    h2 the truncation of the exact remainder, r2 the final remainder
    (itself bf16-exact up to a ~2^-70 tail). x == h1 + h2 + r2 in f32."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    h1 = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)
    r = x - h1
    ur = jax.lax.bitcast_convert_type(r, jnp.uint32)
    h2 = jax.lax.bitcast_convert_type(ur & np.uint32(0xFFFF0000), jnp.float32)
    return h1, h2, r - h2


def perm_rows_mm(P_bf16, xb):
    """Row permutation of a (nblk, B) panel as ONE-HOT MXU matmuls:
    out = P @ xb with P the bf16 one-hot permutation matrix. Exact for f32
    payloads via _split3_exact — every output element of each pass is a
    single 1.0*h product (bf16 widened losslessly into the f32
    accumulator), so the three passes reconstruct the f32 value. The XLA
    row-gather this replaces runs at the TPU's panel-gather rate
    (~0.33 ns/elem, GEN_PANEL_NS); the matmul form rides the MXU instead
    (A/B in benchmarks/probe_r4_gen.py r4_perm_ab_time)."""
    if xb.dtype != jnp.float32:
        return (
            jnp.dot(P_bf16.astype(xb.dtype), xb, preferred_element_type=xb.dtype)
            if xb.dtype != jnp.bfloat16
            else jnp.dot(P_bf16, xb, preferred_element_type=jnp.float32).astype(xb.dtype)
        )
    h1, h2, r2 = _split3_exact(xb)
    # ONE matmul over the column-concatenated splits: P (the dominant
    # operand, nblk^2 bf16) streams once instead of three times
    B = xb.shape[1]
    h = jnp.concatenate(
        [h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16), r2.astype(jnp.bfloat16)],
        axis=1,
    )
    o = jnp.dot(P_bf16, h, preferred_element_type=jnp.float32)
    return o[:, :B] + o[:, B : 2 * B] + o[:, 2 * B :]


@partial(
    jax.jit,
    static_argnames=(
        "B",
        "W",
        "base8",
        "padL",
        "n_pad",
        "m",
        "m_pad",
        "mixed",
        "has_hub",
        "has_hubrow",
        "has_spill",
        "has_flip",
        "sproute_statics",
        "sproute_interpret",
    ),
)
def spmv_gen(
    win_val,
    x,
    bperm,
    bout,
    flip,
    hub_slab,
    hub_cols,
    hubr_slab,
    hubr_rows,
    sp_val,
    sp_ind,
    sp_rows,
    B: int,
    W: int,
    base8: int,
    padL: int,
    n_pad: int,
    m: int,
    m_pad: int,
    mixed: bool = False,
    has_hub: bool = False,
    has_hubrow: bool = False,
    has_spill: bool = False,
    has_flip: bool = False,
    sproute=None,
    sproute_statics=None,
    sproute_interpret: bool = False,
):
    """General-sparsity SpMV: block-RCM-permuted band window + dense
    hub-column slab + COO spill, fused into ONE compiled program
    (per-dispatch latency through the remote tunnel is ~ms, so the
    composition must not multiply it).

    The decomposition P A P^T = Band + HubSlab + Spill is planner-built
    (plan._build_gen). P is BLOCK-granular (B-element blocks of the
    index space are reordered whole): a full-length elementwise
    permutation gathers at ~0.08 G elem/s on this TPU while B=128-wide
    panel gathers run ~3 G elem/s (benchmarks/PROBE_general.jsonl), so
    x/y permutes are reshaped panel gathers, not scalar gathers. After
    permutation, near-diagonal entries ride the banded-window dense form
    (spmv_bwd layout), dense columns (power-law hubs, ORIGINAL column
    ids) become a dense (m_pad, k) slab on the MXU, and window outliers
    spill to a sorted segment-sum. Covers the structure classes the
    reference's gather-kernel SpMV handles uniformly on x86
    (level2/aoclsparse_csrmv_kt.cpp:31-108) — gathers here are O(m/B)
    panels and the O(k) hub pick, never O(nnz).
    """
    nblk = m_pad // B
    xb = jnp.pad(x, (0, m_pad - x.shape[0])).reshape(nblk, B)
    xpb = xb[bperm]  # (nblk, B) block-permuted x
    if has_flip:
        # per-block orientation (planner _block_flips): dense where-reverse,
        # negligible next to the band stream
        xpb = jnp.where(flip[:, None], xpb[:, ::-1], xpb)
    xp = xpb.reshape(-1)  # (m_pad,)
    xpad = jnp.pad(xp, (padL, n_pad - padL - m_pad))
    yp = spmv_bwd(win_val, xpad, W, base8, n_pad, mixed)[:m_pad]
    if has_spill:
        if sproute is not None:
            from ...planner.spill_route import spill_route_apply

            yp = spill_route_apply(
                xp, yp, sproute, sproute_statics, interpret=sproute_interpret
            )
        else:
            yp = yp + jax.ops.segment_sum(
                sp_val * xp[sp_ind], sp_rows, num_segments=m_pad, indices_are_sorted=True
            )
    if has_hub:
        if mixed:
            yp = yp + (
                hub_slab.astype(jnp.bfloat16) @ x[hub_cols].astype(jnp.bfloat16)
            ).astype(yp.dtype)
        else:
            yp = yp + hub_slab @ x[hub_cols]
    if has_hubrow:
        # dense rows (transpose-side hubs): (kr, m_pad) slab against the
        # permuted x, scattered back at kr permuted row positions
        if mixed:
            contrib = (
                hubr_slab.astype(jnp.bfloat16) @ xp.astype(jnp.bfloat16)
            ).astype(yp.dtype)
        else:
            contrib = hubr_slab @ xp
        yp = yp.at[hubr_rows].add(contrib)
    ypb = yp.reshape(nblk, B)
    if has_flip:
        ypb = jnp.where(flip[:, None], ypb[:, ::-1], ypb)
    return ypb[bout].reshape(-1)[:m]


@partial(
    jax.jit,
    static_argnames=(
        "B",
        "W",
        "padL",
        "start",
        "TM",
        "m",
        "m_pad",
        "interpret",
        "has_hub",
        "has_hubrow",
        "has_spill",
        "has_flip",
        "sproute_statics",
    ),
)
def spmv_gen_bandv(
    vt4,
    x,
    bperm,
    bout,
    flip,
    hub_slab,
    hub_cols,
    hubr_slab,
    hubr_rows,
    sp_val,
    sp_ind,
    sp_rows,
    B: int,
    W: int,
    padL: int,
    start: int,
    TM: int,
    m: int,
    m_pad: int,
    interpret: bool = False,
    has_hub: bool = False,
    has_hubrow: bool = False,
    has_spill: bool = False,
    has_flip: bool = False,
    bperm_oh=None,
    bout_oh=None,
    sproute=None,
    sproute_statics=None,
):
    """spmv_gen_bandt with the band part on the vertical-layout kernel
    (kernels/pallas/spmv.py pallas_spmv_band_v — full 8-sublane tiles,
    beats the v2 kernel in every same-window A/B): vt4 is the
    pre-transformed band (ExecForm.bandt_vertical), possibly bf16 under
    the precision policy (the web-profile lever: the band is the dominant
    traffic of the gen composite). One compiled program.

    bperm_oh/bout_oh: optional bf16 one-hot permutation matrices
    (ExecForm.gen_perm_onehots) switching the x/y block permutes from the
    XLA row-gather to exact MXU matmuls (perm_rows_mm)."""
    from ..pallas.spmv import pallas_spmv_band_v

    nblk = m_pad // B
    xb = jnp.pad(x, (0, m_pad - x.shape[0])).reshape(nblk, B)
    # (nblk, B) block-permuted x
    xpb = xb[bperm] if bperm_oh is None else perm_rows_mm(bperm_oh, xb)
    if has_flip:
        xpb = jnp.where(flip[:, None], xpb[:, ::-1], xpb)
    xp = xpb.reshape(-1)  # (m_pad,)
    xe = jnp.pad(xp, (padL, 0))
    yp = pallas_spmv_band_v(vt4, xe, W, start, TM=TM, interpret=interpret)[:m_pad]
    if has_spill:
        if sproute is not None:
            # gather-free spill tail: one-hot select -> Benes route ->
            # one-hot accumulate (3.4x the gather+segsum at webbase scale,
            # benchmarks/PROBE_route.jsonl)
            from ...planner.spill_route import spill_route_apply

            yp = spill_route_apply(xp, yp, sproute, sproute_statics, interpret=interpret)
        else:
            yp = yp + jax.ops.segment_sum(
                sp_val * xp[sp_ind], sp_rows, num_segments=m_pad, indices_are_sorted=True
            )
    if has_hub:
        yp = yp + hub_slab @ x[hub_cols]
    if has_hubrow:
        yp = yp.at[hubr_rows].add(hubr_slab @ xp)
    ypb = yp.reshape(nblk, B)
    if has_flip:
        ypb = jnp.where(flip[:, None], ypb[:, ::-1], ypb)
    out = ypb[bout] if bout_oh is None else perm_rows_mm(bout_oh, ypb)
    return out.reshape(-1)[:m]


@partial(
    jax.jit,
    static_argnames=(
        "W",
        "padL",
        "start",
        "TM",
        "m_pad",
        "interpret",
        "has_hub",
        "has_hubrow",
        "has_spill",
        "sproute_statics",
    ),
)
def spmv_gen_bandv_p(
    vt4,
    xp,
    hub_slab,
    hub_cols_p,
    hubr_slab,
    hubr_rows,
    sp_val,
    sp_ind,
    sp_rows,
    W: int,
    padL: int,
    start: int,
    TM: int,
    m_pad: int,
    interpret: bool = False,
    has_hub: bool = False,
    has_hubrow: bool = False,
    has_spill: bool = False,
    sproute=None,
    sproute_statics=None,
):
    """PERMUTED-SPACE gen composite apply: yp = (P A P^T) xp.

    The spmv_gen_bandv composite pays two full-length element gathers per
    call for the x/y permutes — ~1.7 ms each at this TPU's gather rate on
    an m=262144 operand, which dominates the amortized per-iteration time
    (scramble profile: band ~0.6 ms vs ~3.4 ms of permutes,
    benchmarks/BENCH_gen_r3*.jsonl). Iterative callers (CG/GMRES and any
    y <- f(A x) chain) can instead hoist the permutation OUT of the loop:
    permute b once (ExecForm.gen_perm_maps), iterate with this
    permutation-free apply, un-permute the final iterate once. The hub
    columns gather from xp at pre-mapped permuted positions
    (hub_cols_p — O(k), not O(m)); band/spill/hub-row terms already live
    in permuted space. Padding-tail rows are exact zeros (zero band rows),
    so Krylov iterations on the padded vector are unaffected."""
    xe = jnp.pad(xp, (padL, 0))
    from ..pallas.spmv import pallas_spmv_band_v

    yp = pallas_spmv_band_v(vt4, xe, W, start, TM=TM, interpret=interpret)[:m_pad]
    if has_spill:
        if sproute is not None:
            from ...planner.spill_route import spill_route_apply

            yp = spill_route_apply(xp, yp, sproute, sproute_statics, interpret=interpret)
        else:
            yp = yp + jax.ops.segment_sum(
                sp_val * xp[sp_ind], sp_rows, num_segments=m_pad, indices_are_sorted=True
            )
    if has_hub:
        yp = yp + hub_slab @ xp[hub_cols_p]
    if has_hubrow:
        yp = yp.at[hubr_rows].add(hubr_slab @ xp)
    return yp


@partial(
    jax.jit,
    static_argnames=(
        "B",
        "W",
        "padL",
        "start",
        "TM",
        "m",
        "m_pad",
        "interpret",
        "has_hub",
        "has_hubrow",
        "has_spill",
        "has_flip",
    ),
)
def spmv_gen_bandt(
    vt,
    x,
    bperm,
    bout,
    flip,
    hub_slab,
    hub_cols,
    hubr_slab,
    hubr_rows,
    sp_val,
    sp_ind,
    sp_rows,
    B: int,
    W: int,
    padL: int,
    start: int,
    TM: int,
    m: int,
    m_pad: int,
    interpret: bool = False,
    has_hub: bool = False,
    has_hubrow: bool = False,
    has_spill: bool = False,
    has_flip: bool = False,
):
    """spmv_gen with the band part on the Pallas transposed-band kernel
    (vt is the (W, m_pad) slab in PERMUTED row space; everything else as
    spmv_gen). One compiled program."""
    from ..pallas.spmv import pallas_spmv_band_t

    nblk = m_pad // B
    xb = jnp.pad(x, (0, m_pad - x.shape[0])).reshape(nblk, B)
    xpb = xb[bperm]  # (nblk, B) block-permuted x
    if has_flip:
        xpb = jnp.where(flip[:, None], xpb[:, ::-1], xpb)
    xp = xpb.reshape(-1)  # (m_pad,)
    xe = jnp.pad(xp, (padL, 0))
    yp = pallas_spmv_band_t(vt, xe, W, start, TM=TM, interpret=interpret)
    if has_spill:
        yp = yp + jax.ops.segment_sum(
            sp_val * xp[sp_ind], sp_rows, num_segments=m_pad, indices_are_sorted=True
        )
    if has_hub:
        yp = yp + hub_slab @ x[hub_cols]
    if has_hubrow:
        yp = yp.at[hubr_rows].add(hubr_slab @ xp)
    ypb = yp.reshape(nblk, B)
    if has_flip:
        ypb = jnp.where(flip[:, None], ypb[:, ::-1], ypb)
    return ypb[bout].reshape(-1)[:m]


@partial(jax.jit, static_argnames=("G", "W", "rel", "m", "mixed"))
def spmv_bwdg(band, x, G: int, W: int, rel: int, m: int, mixed: bool = False):
    """SpMV over a G-row-group group-relative band: ``band`` is
    (nblk, G, W) with band[g, r, c] = A[G*g + r, G*g + rel + c].

    This is the storage layout the band x band SpGEMM numeric engine emits
    for C (kernels/xla/spgemm_band.py), so a product result can be consumed
    by SpMV directly — no CSR extraction gather (~13 ns/nnz on this TPU),
    no relayout. Same static-slice x-window trick as :func:`spmv_bwd`, at
    group granularity G: x is padded so every window start is G-aligned,
    then each window is a concat of consecutive G-blocks. The einsum is a
    batched matvec (VPU reduce — fine on this stack; only batched matMUL
    is pathological). Reference role: csrmv over an optimized internal
    format (level2/aoclsparse_mv.cpp:179 format switch).
    """
    nblk = band.shape[0]
    # left-pad so window starts (G*g + rel) become G-aligned and non-negative
    padL = (-rel) % G
    while rel + padL < 0:
        padL += G
    d = (rel + padL) // G  # first window's start, in G-blocks of padded x
    nsl = -(-W // G)  # G-blocks spanned by one (G-aligned) window
    # padded blocks: cover every window AND all of x (x can extend past the
    # last window when the band only touches a left portion of the columns)
    nbx = max(d + nblk + nsl, -(-(padL + x.shape[0]) // G))
    xp = jnp.pad(x, (padL, nbx * G - padL - x.shape[0]))
    xg = xp.reshape(nbx, G)
    win = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(xg, d + j, nblk, 0) for j in range(nsl)],
        axis=1,
    )  # (nblk, nsl*G); row g = padded cols [G*(d+g), +nsl*G)
    if nsl * G != W:
        win = jax.lax.slice_in_dim(win, 0, W, axis=1)
    if mixed:
        out = jnp.einsum(
            "grw,gw->gr",
            band.astype(jnp.bfloat16),
            win.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(band.dtype)
    else:
        out = jnp.einsum("grw,gw->gr", band, win)
    return out.reshape(-1)[:m]


#: unroll threshold: static slices fuse into one kernel (fast); beyond this,
#: compile time would grow linearly so we fall back to the on-device scan
# unrolled static-slice cap: one fused XLA kernel, no scan/dynamic-slice
# overhead. 6x6-block shell meshes (pwtk class) carry ~150 distinct element
# diagonals, which the round-4 real-matrix sweep showed must ride this path
# (the gen fallback built a 2.4 GB band there)
DIA_UNROLL = 192


def spmv_diag(dvals, offs, x, m: int, L: int, n_pad: int, offs_static=None):
    """Dispatcher: unrolled static-slice kernel for few diagonals (fuses into
    one XLA kernel like spmv_bwd), scan fallback for many."""
    if offs_static is not None and len(offs_static) <= DIA_UNROLL:
        return _spmv_diag_unrolled(dvals, x, tuple(int(o) for o in offs_static), m, L, n_pad)
    return spmv_diag_scan(dvals, offs, x, m, L, n_pad)


@partial(jax.jit, static_argnames=("offs", "m", "L", "n_pad"))
def _spmv_diag_unrolled(dvals, x, offs: tuple, m: int, L: int, n_pad: int):
    xp = jnp.pad(x, (L, n_pad - L - x.shape[0]))
    acc = jnp.zeros((m,), dvals.dtype)
    for k, d in enumerate(offs):
        acc = acc + dvals[k] * jax.lax.dynamic_slice_in_dim(xp, d + L, m, 0)
    return acc


@partial(jax.jit, static_argnames=("m", "L", "n_pad"))
def spmv_diag_scan(dvals, offs, x, m: int, L: int, n_pad: int):
    """Scan-over-diagonals SpMV — the gather-free form for stencil-type
    matrices (few distinct generalized diagonals j-i, arbitrary spread —
    where the contiguous band window of spmv_bwd would explode; e.g. 5/7/27-
    point finite-difference stencils).

    dvals (ndiag, m) holds diagonal d's values aligned to rows; each scan
    step is one shifted elementwise FMA (shifts stream at HBM rate on TPU,
    measured ~300 G elem/s vs ~0.14 G for gathers). DIA kernel analog
    (level2/aoclsparse_diamv.hpp) rebuilt as a single compiled scan so
    compile time is O(1) in ndiag."""
    xp = jnp.pad(x, (L, n_pad - L - x.shape[0]))

    def step(acc, args):
        dv, off = args
        xs = jax.lax.dynamic_slice(xp, (off + L,), (m,))
        return acc + dv * xs, None

    acc, _ = jax.lax.scan(
        step, jnp.zeros((m,), dvals.dtype), (dvals, offs.astype(jnp.int32))
    )
    return acc


@partial(jax.jit, static_argnames=("m", "n"))
def spmv_csr_dense_ref(ind, val, row_ids, x, m: int, n: int):
    """Debug-only: materialize dense then matmul (tiny matrices)."""
    A = jnp.zeros((m, n), dtype=val.dtype).at[row_ids, ind].add(val)
    return A @ x
