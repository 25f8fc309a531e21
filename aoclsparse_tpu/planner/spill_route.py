"""Plan-time construction of the spill-route engine (VERDICT r4 item 1).

Turns the gen form's unstructured spill triplets (sp_rows, sp_ind, sp_val —
all in PERMUTED block space) into the three gather-free phases of
kernels/pallas/spill_route.py:

  1. column-sorted select chunks: entries grouped by 1024-wide x block,
     each block's entries packed into (8, 128) tiles (pad slots val=0);
  2. a Benes routing plan moving each entry's contribution from its select
     slot to its accumulate slot (native benes_plan, masks on device);
  3. row-sorted accumulate chunks: entries grouped by 1024-row y block,
     monotone block ids covering EVERY y block (untouched blocks get one
     all-pad chunk reading the trailing zero contrib tile).

Everything here is vectorized numpy + one O(n log n) native call; the
device arrays are value-refreshable through the stored slot map
(`refresh`), keeping the update_values contract (CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SpillRoute", "build_spill_route", "StripedRoute", "build_striped_route"]


@dataclasses.dataclass
class SpillRoute:
    k: int
    n: int  # 2**k routed slots
    nxblk: int
    nyblk: int
    n_sel_tiles: int
    n_acc_tiles: int  # real (entry-bearing) accumulate chunks
    m_pad: int
    sel_idx: jax.Array  # (n_sel_tiles, 8, 128) int32 local col idx
    sel_val: jax.Array  # (n_sel_tiles, 8, 128) values (0 in pad slots)
    sel_blk: jax.Array  # (n_sel_tiles,) int32 x-block per chunk
    acc_idx: jax.Array  # (n_chunks, 8, 128) int32 local row idx
    acc_blk: jax.Array  # (n_chunks,) int32 monotone y-block ids
    acc_cid: jax.Array  # (n_chunks,) int32 contrib tile (n_acc_tiles = zero)
    masks: jax.Array  # outer-stage masks (k>20 hierarchy / k<7 full XLA)
    masks_packed: jax.Array  # (2^d, ceil/8, 2^kc) bit-packed fused masks
    _val_slot: np.ndarray  # select slot of each spill entry (refresh map)
    _val_dtype: np.dtype = None

    def refresh(self, sp_val_host: np.ndarray) -> None:
        flat = np.zeros(self.n_sel_tiles * 1024, dtype=sp_val_host.dtype)
        flat[self._val_slot] = sp_val_host
        self.sel_val = jnp.asarray(flat.reshape(self.n_sel_tiles, 8, 128))

    def ops(self):
        """The jit-traversable operand tuple handed to the kernels."""
        return (
            self.sel_idx, self.sel_val, self.sel_blk,
            self.acc_idx, self.acc_blk, self.acc_cid,
            self.masks, self.masks_packed,
        )

    def statics(self):
        return (self.k, self.n, self.nxblk, self.nyblk, self.n_acc_tiles, self.m_pad)


def _chunk_side(keys: np.ndarray, blk_width: int, nblk_total: int):
    """Group entries by key // blk_width and pack each group into 1024-slot
    chunks. Returns (slot_of_entry, chunk_blk_ids, n_tiles)."""
    P = keys.size
    blk = keys // blk_width
    order = np.argsort(blk, kind="stable")
    ub, counts = np.unique(blk[order], return_counts=True)
    tiles_per = -(-counts // 1024)
    base = np.zeros(ub.size + 1, dtype=np.int64)
    np.cumsum(tiles_per, out=base[1:])
    # position of each (sorted) entry within its group
    starts = np.zeros(ub.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(P, dtype=np.int64) - np.repeat(starts, counts)
    slot_sorted = np.repeat(base[:-1], counts) * 1024 + pos
    slot = np.empty(P, dtype=np.int64)
    slot[order] = slot_sorted
    chunk_blk = np.repeat(ub, tiles_per).astype(np.int32)
    return slot, chunk_blk, int(base[-1])


def build_spill_route(
    sp_rows, sp_ind, sp_val, m_pad: int, n_pad_x: Optional[int] = None
) -> SpillRoute:
    """sp_rows/sp_ind/sp_val: host (or device) spill triplets in permuted
    space — rows into yp (m_pad), cols into xp (m_pad unless n_pad_x)."""
    from .. import native

    rows = np.asarray(sp_rows, dtype=np.int64)
    cols = np.asarray(sp_ind, dtype=np.int64)
    vals = np.asarray(sp_val)
    P = rows.size
    n_x = int(n_pad_x if n_pad_x is not None else m_pad)
    nxblk = -(-n_x // 1024)
    nyblk = -(-m_pad // 1024)

    sel_slot, sel_chunk_blk, n_sel_tiles = _chunk_side(cols, 1024, nxblk)
    acc_slot, acc_chunk_blk, n_acc_tiles = _chunk_side(rows, 1024, nyblk)

    n = 1 << max(int(np.ceil(np.log2(max(n_sel_tiles, n_acc_tiles, 1) * 1024))), 10)
    k = int(np.log2(n))

    # Benes src: out[acc_slot] = in[sel_slot]; remaining outputs (chunk pad
    # slots + tail) fed by the unused (zero-valued) select slots in order
    src = np.full(n, -1, dtype=np.int64)
    src[acc_slot] = sel_slot
    used = np.zeros(n, dtype=bool)
    used[sel_slot] = True
    src[src == -1] = np.nonzero(~used)[0]
    masks_np = native.benes_plan(k, src)
    from ..kernels.xla.route import plan_route_arrays

    outer_np, packed_np = plan_route_arrays(k, masks_np)

    sel_idx_f = np.zeros(n_sel_tiles * 1024, dtype=np.int32)
    sel_idx_f[sel_slot] = (cols % 1024).astype(np.int32)
    sel_val_f = np.zeros(n_sel_tiles * 1024, dtype=vals.dtype)
    sel_val_f[sel_slot] = vals

    acc_idx_f = np.zeros(n_acc_tiles * 1024, dtype=np.int32)
    acc_idx_f[acc_slot] = (rows % 1024).astype(np.int32)

    # full accumulate chunk list: real chunks + one all-pad chunk for every
    # untouched y block, merged in block order (monotone requirement)
    touched = np.zeros(nyblk, dtype=bool)
    touched[acc_chunk_blk] = True
    missing = np.nonzero(~touched)[0].astype(np.int32)
    all_blk = np.concatenate([acc_chunk_blk, missing])
    all_cid = np.concatenate(
        [np.arange(n_acc_tiles, dtype=np.int32),
         np.full(missing.size, n_acc_tiles, dtype=np.int32)]
    )
    order_c = np.argsort(all_blk, kind="stable")
    all_blk = all_blk[order_c]
    all_cid = all_cid[order_c]
    acc_idx_tiles = np.zeros((all_blk.size, 8, 128), dtype=np.int32)
    acc_idx_tiles[all_cid < n_acc_tiles] = acc_idx_f.reshape(n_acc_tiles, 8, 128)[
        all_cid[all_cid < n_acc_tiles]
    ]

    with jax.ensure_compile_time_eval():
        sr = SpillRoute(
            k=k,
            n=n,
            nxblk=nxblk,
            nyblk=nyblk,
            n_sel_tiles=n_sel_tiles,
            n_acc_tiles=n_acc_tiles,
            m_pad=int(m_pad),
            sel_idx=jnp.asarray(sel_idx_f.reshape(n_sel_tiles, 8, 128)),
            sel_val=jnp.asarray(sel_val_f.reshape(n_sel_tiles, 8, 128)),
            sel_blk=jnp.asarray(sel_chunk_blk),
            acc_idx=jnp.asarray(acc_idx_tiles),
            acc_blk=jnp.asarray(all_blk),
            acc_cid=jnp.asarray(all_cid),
            masks=None if outer_np is None else jnp.asarray(outer_np),
            masks_packed=None if packed_np is None else jnp.asarray(packed_np),
            _val_slot=sel_slot,
            _val_dtype=vals.dtype,
        )
    return sr


def spill_route_apply(xp, yp, ops, statics, interpret: bool = False):
    """yp + spill contribution, all phases gather-free. xp/yp: (m_pad,)."""
    from ..kernels.pallas.spill_route import pallas_oh_accum, pallas_oh_select
    from ..kernels.xla.route import apply_route

    sel_idx, sel_val, sel_blk, acc_idx, acc_blk, acc_cid, masks, masks_packed = ops
    k, n, nxblk, nyblk, n_acc_tiles, m_pad = statics
    x3 = jnp.pad(xp, (0, nxblk * 1024 - xp.shape[0])).reshape(nxblk, 8, 128)
    contrib = pallas_oh_select(x3, sel_idx, sel_val, sel_blk, interpret=interpret)
    flat = contrib.reshape(-1)
    if flat.shape[0] < n:
        flat = jnp.pad(flat, (0, n - flat.shape[0]))
    routed = apply_route(flat, masks, masks_packed, k, interpret=interpret)
    ctiles = jnp.concatenate(
        [routed[: n_acc_tiles * 1024].reshape(n_acc_tiles, 8, 128),
         jnp.zeros((1, 8, 128), routed.dtype)]
    )
    y3 = jnp.pad(yp, (0, nyblk * 1024 - yp.shape[0])).reshape(nyblk, 8, 128)
    out = pallas_oh_accum(ctiles, acc_idx, acc_blk, acc_cid, y3, interpret=interpret)
    return out.reshape(-1)[: yp.shape[0]]


@dataclasses.dataclass
class StripedRoute:
    """Row-striped composition of SpillRoutes (whole-matrix engine at scale).

    One global Benes network walks randomly over 8*n bytes of plan state —
    past ~2^18 slots that walk falls off every cache (measured 53 ns/slot-
    stage at k<=16 vs ~200 ns at k>=22 on this host, benchmarks r5) and a
    48M-nnz plan costs ~10 minutes. Splitting the matrix into row stripes
    sized for ~2^18-slot sub-networks keeps every walk cache-resident AND
    the stripes build in parallel threads; the apply side concatenates the
    stripes' disjoint y ranges (select reads the shared x; total route work
    n*(2k_s-1) is LESS than the single network's n*(2k-1))."""

    stripes: list  # SpillRoute per stripe
    row_lo: list  # first row of each stripe (1024-aligned)
    row_hi: list
    m: int
    _val_src: list  # per stripe: entry indices into the CSR value array

    def refresh(self, val_host: np.ndarray) -> None:
        val_host = np.asarray(val_host)
        for sr, idx in zip(self.stripes, self._val_src):
            sr.refresh(val_host[idx])


def build_striped_route(
    rows, cols, vals, m_pad: int, n_pad_x: int, target_slots: Optional[int] = None,
    threads: Optional[int] = None,
) -> StripedRoute:
    """rows must be sorted (CSR order). Stripe boundaries land on 1024-row
    blocks with ~target_slots entries per stripe; sub-plans build in a
    thread pool (native benes_plan releases the GIL)."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    P = rows.size
    if target_slots is None:
        import os as _os

        # 2^19 balances the Benes walk rate (53 ns cache-resident at <=2^18,
        # ~146 at 2^20) against compiled-program size (~40 route stages +
        # 3 pallas calls per stripe)
        target_slots = int(
            float(_os.environ.get("AOCLSPARSE_TPU_ROUTE_STRIPE_SLOTS", str(1 << 19)))
        )
    budget = max(1024, int(target_slots * 0.75))  # slot headroom for padding
    # entry index of each 1024-row block boundary
    blk_starts = np.searchsorted(rows, np.arange(0, m_pad + 1024, 1024))
    bounds = [0]
    for b in blk_starts[1:]:
        if b - bounds[-1] >= budget or b == P:
            if b > bounds[-1]:
                bounds.append(int(b))
    if bounds[-1] != P:
        bounds.append(P)
    stripes_io = []
    for i in range(len(bounds) - 1):
        e0, e1 = bounds[i], bounds[i + 1]
        lo = 0 if e0 == 0 else int(rows[e0] // 1024) * 1024
        hi_row = int(rows[e1 - 1]) if e1 > e0 else lo
        hi = min(m_pad, (hi_row // 1024 + 1) * 1024)
        stripes_io.append((e0, e1, lo, hi))
    results = [None] * len(stripes_io)

    def _one(i):
        e0, e1, lo, hi = stripes_io[i]
        results[i] = build_spill_route(
            rows[e0:e1] - lo, cols[e0:e1], vals[e0:e1],
            m_pad=hi - lo, n_pad_x=n_pad_x,
        )

    import concurrent.futures as cf

    nt = threads
    if nt is None:
        import os as _os

        nt = min(4, _os.cpu_count() or 1)
    if nt > 1 and len(stripes_io) > 1:
        with cf.ThreadPoolExecutor(nt) as ex:
            list(ex.map(_one, range(len(stripes_io))))
    else:
        for i in range(len(stripes_io)):
            _one(i)
    return StripedRoute(
        stripes=results,
        row_lo=[s[2] for s in stripes_io],
        row_hi=[s[3] for s in stripes_io],
        m=int(m_pad),
        _val_src=[np.arange(s[0], s[1], dtype=np.int64) for s in stripes_io],
    )


def striped_route_apply(x, sr: StripedRoute, interpret: bool = False):
    """y (m,) = A @ x through every stripe; stripes write disjoint row
    ranges, concatenated. Stripe structures are traced constants — callers
    amortizing over iterations should jaxpr-trace and pass consts as args
    (same HTTP-413 discipline as every other engine)."""
    parts = []
    for sri, lo, hi in zip(sr.stripes, sr.row_lo, sr.row_hi):
        yp = jnp.zeros((hi - lo,), x.dtype)
        parts.append(
            spill_route_apply(x, yp, sri.ops(), sri.statics(), interpret=interpret)
        )
    return jnp.concatenate(parts)
