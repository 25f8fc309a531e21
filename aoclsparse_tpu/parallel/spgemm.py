"""Distributed SpGEMM numeric stage.

SURVEY.md §5.8(ii): the reference's shared-memory Gustavson row-merge
(level3/aoclsparse_csr2m.cpp:89-200, per-thread dense markers over a static
row split) becomes, on a mesh: the host symbolic stage partitions the
*product list* by C-row blocks (the same static row split), each device
reduces its products with a local segment-sum, and the sharded C values
concatenate row-aligned — no cross-device traffic in the numeric stage at
all because products are grouped by their output row (A's values replicate;
they are nnz-sized, tiny next to the product stream).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["partition_products", "dist_spgemm_numeric", "dist_spgemm_rowpart"]


def dist_spgemm_rowpart(mesh: Mesh, effA, effB, axis: str = "x"):
    """Fully row-partitioned distributed SpGEMM (SURVEY §5.8(ii)).

    Gustavson's row-merge is row-local in A: C's row block d depends only on
    A's row block d (plus the B rows it references), so the SYMBOLIC stage
    decomposes into per-partition marker scans — each shard builds its own
    product plan (native C++ spgemm_expand on its nnz-balanced row block;
    on a real multi-host deployment each host runs only its own) — and the
    NUMERIC stage runs shard-local segment-sums with no cross-device
    traffic (B values replicate; they are nnz-sized, small next to the
    product stream). Returns (Cptr, Cind, Cval) host/device triples.
    """
    from ..native import spgemm_expand
    from .partition import nnz_balanced_bounds

    n_dev = mesh.shape[axis]
    mA = effA.shape[0]
    bounds = nnz_balanced_bounds(effA.ptr, n_dev, align=1)
    ptrA = effA.ptr.astype(np.int64)
    indA = effA.ind.astype(np.int64)
    shard_plans = []
    P_max, nnzC_max = 1, 1
    for d in range(n_dev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        lptr = ptrA[lo : hi + 1] - ptrA[lo]
        lind = indA[ptrA[lo] : ptrA[hi]]
        nat = spgemm_expand(hi - lo, lptr, lind, effB.ptr, effB.ind)
        if nat is None:
            raise RuntimeError("native spgemm_expand unavailable")
        pa, pb, pc, Cptr_l, Cind_l = nat
        pa = pa.astype(np.int64) + int(ptrA[lo])  # back to global A positions
        shard_plans.append((pa, pb.astype(np.int64), pc.astype(np.int64), Cptr_l, Cind_l))
        P_max = max(P_max, pa.size)
        nnzC_max = max(nnzC_max, int(Cptr_l[-1]))
    # pad per-shard product lists to a common length (padding products hit a
    # scratch slot) and per-shard C blocks to nnzC_max
    pa_s = np.zeros((n_dev, P_max), dtype=np.int64)
    pb_s = np.zeros((n_dev, P_max), dtype=np.int64)
    pc_s = np.full((n_dev, P_max), nnzC_max, dtype=np.int64)
    for d, (pa, pb, pc, _, _) in enumerate(shard_plans):
        pa_s[d, : pa.size] = pa
        pb_s[d, : pb.size] = pb
        pc_s[d, : pc.size] = pc
    sh2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    pa_d = jax.device_put(jnp.asarray(pa_s), sh2)
    pb_d = jax.device_put(jnp.asarray(pb_s), sh2)
    pc_d = jax.device_put(jnp.asarray(pc_s), sh2)
    a_d = jax.device_put(jnp.asarray(effA.val), rep)
    b_d = jax.device_put(jnp.asarray(effB.val), rep)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P()),
        out_specs=P(axis, None),
    )
    def _local(pa, pb, pc, av, bv):
        prods = av[pa[0]] * bv[pb[0]]
        out = jax.ops.segment_sum(prods, pc[0], num_segments=nnzC_max + 1)
        return out[None, :nnzC_max]

    c_blocks = np.asarray(_local(pa_d, pb_d, pc_d, a_d, b_d))  # (n_dev, nnzC_max)
    # assemble global C: shard offsets are cumulative local nnz counts
    offs = np.cumsum([0] + [int(p[3][-1]) for p in shard_plans])
    Cptr = np.zeros(mA + 1, dtype=np.int64)
    Cind_parts, Cval_parts = [], []
    for d, (_, _, _, Cptr_l, Cind_l) in enumerate(shard_plans):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        Cptr[lo + 1 : hi + 1] = Cptr_l[1:] + offs[d]
        nnz_l = int(Cptr_l[-1])
        Cind_parts.append(Cind_l[:nnz_l])
        Cval_parts.append(c_blocks[d, :nnz_l])
    Cind = np.concatenate(Cind_parts) if Cind_parts else np.zeros(0, np.int32)
    Cval = np.concatenate(Cval_parts) if Cval_parts else np.zeros(0)
    return Cptr, Cind, Cval


def partition_products(plan, n_dev: int):
    """Split a SpgemmPlan's (pa, pb, pc) by C-row blocks into n_dev equal
    shards (padded with no-op products pointing at a scratch slot)."""
    pa = np.asarray(plan.pa)
    pb = np.asarray(plan.pb)
    pc = np.asarray(plan.pc)
    nnzC = plan.nnz
    # device d owns C value rows [d*chunk, (d+1)*chunk)
    chunk = -(-nnzC // n_dev) if nnzC else 1
    owner = np.minimum(pc // chunk, n_dev - 1) if pc.size else pc
    counts = np.bincount(owner, minlength=n_dev) if pc.size else np.zeros(n_dev, np.int64)
    P_max = int(counts.max()) if counts.size else 0
    P_max = max(P_max, 1)
    pa_s = np.zeros((n_dev, P_max), dtype=np.int64)
    pb_s = np.zeros((n_dev, P_max), dtype=np.int64)
    pc_s = np.full((n_dev, P_max), chunk, dtype=np.int64)  # pad -> scratch slot
    for d in range(n_dev):
        sel = owner == d
        cnt = int(counts[d])
        pa_s[d, :cnt] = pa[sel]
        pb_s[d, :cnt] = pb[sel]
        pc_s[d, :cnt] = pc[sel] - d * chunk  # local offsets
    return pa_s, pb_s, pc_s, chunk


def dist_spgemm_numeric(mesh: Mesh, plan, a_val, b_val, axis: str = "x"):
    """Numeric stage on the mesh; returns the (nnzC,) C value vector."""
    n_dev = mesh.shape[axis]
    pa_s, pb_s, pc_s, chunk = partition_products(plan, n_dev)
    sh2 = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    pa_d = jax.device_put(jnp.asarray(pa_s), sh2)
    pb_d = jax.device_put(jnp.asarray(pb_s), sh2)
    pc_d = jax.device_put(jnp.asarray(pc_s), sh2)
    a_d = jax.device_put(jnp.asarray(a_val), rep)
    b_d = jax.device_put(jnp.asarray(b_val), rep)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P()),
        out_specs=P(axis, None),
    )
    def _local(pa, pb, pc, av, bv):
        prods = av[pa[0]] * bv[pb[0]]
        # chunk+1 segments: the last is the padding scratch slot
        out = jax.ops.segment_sum(prods, pc[0], num_segments=chunk + 1)
        return out[None, :chunk]

    c_blocks = _local(pa_d, pb_d, pc_d, a_d, b_d)  # (n_dev, chunk)
    return c_blocks.reshape(-1)[: plan.nnz]
