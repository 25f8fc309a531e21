"""Gather-free application of STATIC permutations (Benes routing network).

Every irregular index op on this stack costs ~13-18 ns/element as an XLA
gather/scatter regardless of sortedness (benchmarks/PROBE_spgemm.jsonl) —
that floor is what keeps scatter-class SpMV (webbase/scircuit stand-ins)
10-50x off their targets and makes the SpGEMM CSR extraction cost 15x its
numeric kernel (VERDICT r4 items 1 and 6). But those index maps are STATIC:
they derive from the sparsity pattern, not the values. A fixed permutation
of n = 2^k slots is realizable as a Benes network — 2k-1 stages of
"conditionally swap i with i^s" switches with strides
2^(k-1), ..., 2, 1, 2, ..., 2^(k-1) — whose per-stage work on TPU is two
circular rolls plus two selects: pure streaming VPU traffic at memory rate,
no per-element addressing anywhere.

The switch settings (cross masks) are computed ONCE at plan time by the
native Waksman looping solver (native benes_plan, O(n log n) C++) and live
on device as an int8 (2k-1, n) array; apply cost is
~(2k-1) * 3 passes over the vector.

The reference has no analog (CPUs gather at L2 latency); this is the
TPU-first replacement for aoclsparse_gthr-style index streams feeding hot
loops (reference level1/aoclsparse_gthr.cpp:33).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "StaticRoute",
    "apply_benes",
    "apply_route",
    "benes_strides",
    "plan_route_arrays",
]


def plan_route_arrays(k: int, masks_np: np.ndarray):
    """Split plan-time masks into the device arrays apply_route wants:
    (outer, packed). k in [7, 20]: packed = (1, ceil((2k-1)/8), n) for the
    single fused VMEM pass, outer = None. k > 20: the middle 2*20-1 stages
    decompose into 2^(k-20) INDEPENDENT k=20 subnetworks (strides <= 2^19
    never cross the top k-20 address bits), each packed for the fused
    kernel; the 2(k-20) outer stages stay as unpacked masks for the XLA
    rolls. k < 7: everything XLA (outer = full masks, packed None)."""
    from ..pallas.route_fused import FUSED_MAX_K, pack_masks

    S = masks_np.shape[0]
    if k < 7:
        return masks_np, None
    kc = min(k, FUSED_MAX_K)
    d = k - kc
    nsub = 1 << kc
    if d == 0:
        return None, pack_masks(masks_np)[None]
    outer = np.concatenate([masks_np[:d], masks_np[S - d :]])
    mid = masks_np[d : S - d]
    packed = np.stack(
        [pack_masks(mid[:, h * nsub : (h + 1) * nsub]) for h in range(1 << d)]
    )
    return outer, packed


def _xla_stage(v, mask_row, s: int, iot):
    bit = (iot & np.int32(s)) != 0
    partner = jnp.where(bit, jnp.roll(v, s), jnp.roll(v, -s))
    return jnp.where(mask_row != 0, partner, v)


def apply_route(v, outer, packed, k: int, interpret: bool = False):
    """Best available Benes apply for a (outer, packed) plan from
    plan_route_arrays. The fused VMEM kernel cuts per-apply traffic
    ~500 MB -> ~13 MB at k=20 (route-only 0.57 ms vs ~6 ms staged XLA in
    an ~80 GB/s window, benchmarks/PROBE_route.jsonl)."""
    if packed is None:
        return apply_benes(v, outer, k)
    from ..pallas.route_fused import pallas_benes_apply

    nhalf = packed.shape[0]
    if nhalf == 1:
        return pallas_benes_apply(v, packed[0], k, interpret=interpret)
    d = int(np.log2(nhalf))
    kc = k - d
    strides = benes_strides(k)
    S = len(strides)
    iot = jax.lax.iota(jnp.int32, v.shape[0])
    for t in range(d):
        v = _xla_stage(v, outer[t], strides[t], iot)
    nsub = 1 << kc
    parts = [
        pallas_benes_apply(
            jax.lax.slice_in_dim(v, h * nsub, (h + 1) * nsub),
            packed[h],
            kc,
            interpret=interpret,
        )
        for h in range(nhalf)
    ]
    v = jnp.concatenate(parts)
    for t in range(d):
        v = _xla_stage(v, outer[d + t], strides[S - d + t], iot)
    return v


def benes_strides(k: int):
    """Stage strides 2^(k-1), ..., 2, 1, 2, ..., 2^(k-1) (2k-1 stages)."""
    if k <= 0:
        return ()
    down = [1 << (k - 1 - t) for t in range(k)]
    return tuple(down + [1 << (t + 1) for t in range(k - 1)])


@partial(jax.jit, static_argnames=("k",))
def apply_benes(v, masks, k: int):
    """Route v (n = 2^k elements, any dtype) through the Benes network with
    the given (2k-1, n) cross masks (int8/bool). v'[i] = v[i^s] when
    masks[t, i] else v[i]; masks are switch-symmetric (c[i] == c[i^s]).

    Rolls realize the xor partner: for i with bit s clear, i^s = i+s =
    roll(v, -s)[i]; bit set, i^s = i-s = roll(v, s)[i] (wraps never cross a
    switch because xor stays inside the 2s-aligned block)."""
    n = v.shape[0]
    if n != (1 << k):
        raise ValueError(f"apply_benes: v has {n} elements, expected 2^{k}")
    if k == 0:
        return v
    iot = jax.lax.iota(jnp.int32, n)
    for t, s in enumerate(benes_strides(k)):
        bit = (iot & np.int32(s)) != 0
        partner = jnp.where(bit, jnp.roll(v, s), jnp.roll(v, -s))
        v = jnp.where(masks[t] != 0, partner, v)
    return v


class StaticRoute:
    """A plan-time-fixed permutation with padding: out[j] = in[src[j]] for
    j < n_out over an input of n_in slots, applied on device without any
    gather. Build once (host), apply per call (device).

    Slots are padded to n = 2^k; pad inputs route to pad outputs (the
    completion is computed with one host argsort)."""

    def __init__(self, src, n_in: Optional[int] = None):
        from ... import native

        src = np.asarray(src, dtype=np.int64).reshape(-1)
        n_out = src.size
        if n_in is None:
            n_in = int(src.max()) + 1 if n_out else 0
        if n_out and np.unique(src).size != n_out:
            raise ValueError("StaticRoute requires injective src (a partial permutation)")
        n = 1 << max(int(np.ceil(np.log2(max(n_in, n_out, 1)))), 0)
        self.k = int(np.log2(n))
        self.n = n
        self.n_in = int(n_in)
        self.n_out = int(n_out)
        full = np.full(n, -1, dtype=np.int64)
        full[:n_out] = src
        # complete the bijection: unused input slots feed the pad outputs
        used = np.zeros(n, dtype=bool)
        used[src] = True
        full[n_out:] = np.nonzero(~used)[0]
        self._masks = jnp.asarray(native.benes_plan(self.k, full))

    def apply(self, v):
        """v: (n_in,) or (n_in, ...) device array -> (n_out, ...) routed."""
        lead = v.shape[0]
        if lead != self.n_in:
            raise ValueError(f"StaticRoute.apply: got {lead}, expected {self.n_in}")
        if self.k == 0:
            return v[: self.n_out]
        pad = self.n - lead
        if pad:
            v = jnp.pad(v, ((0, pad),) + ((0, 0),) * (v.ndim - 1))
        if v.ndim == 1:
            out = apply_benes(v, self._masks, self.k)
        else:
            flat = v.reshape(v.shape[0], -1)
            out = jax.vmap(
                lambda col: apply_benes(col, self._masks, self.k),
                in_axes=1,
                out_axes=1,
            )(flat).reshape(v.shape)
        return out[: self.n_out]
