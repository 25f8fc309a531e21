"""Planner-state persistence: save/load a matrix's optimized plan.

Serving restarts shouldn't replan: the expensive planner products — RCM
permutations, banded-window layouts, hub slabs, blocked solve forms, tuned
block sizes — are pure functions of the matrix *structure*, and on this
host the gen-composite analysis can take seconds to minutes. This module
snapshots a handle's Plan (exec forms + autotune pins) into one .npz and
rebuilds it onto a fresh handle of the same matrix. Triangular solve forms
are deliberately NOT stored: their effective values are op-folded
(transposed/conjugated orderings), so they rebuild from scratch — cheap,
vectorized host work compared to the exec forms' RCM/band analysis.

The reference has no analog (its optimize cost is small enough to re-run;
our checkpoint story extends its staged-computation idioms — SURVEY.md §5.4
— to the planner itself). Values are NOT trusted from the snapshot: every
restored form is refreshed from the live handle's values through its host
scatter maps, so a handle whose values changed since the save still
computes correctly.

Format: npz with arrays named "<slot>::<field>" plus a JSON manifest
(keys, static fields, array container kinds) under "__manifest__".
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.descr import MatrixDescriptor
from ..core.types import AoclSparseError, DiagType, FillMode, MatrixType, Operation, Status

__all__ = ["save_plan", "load_plan"]

_FORMAT_VERSION = 1


def _struct_sig(plan) -> Dict:
    c = plan.clean
    ptr = np.asarray(c.ptr)
    ind = np.asarray(c.ind)
    return {
        "m": int(c.m),
        "n": int(c.n),
        "nnz": int(ind.size),
        "ptr_sum": int(ptr.astype(np.int64).sum()),
        "ind_sum": int(ind.astype(np.int64).sum()),
    }


def _pack_dataclass(obj, slot: str, arrays: Dict, manifest_entry: Dict):
    """Split a flat dataclass into arrays (npz) and JSON-able statics."""
    manifest_entry["cls"] = type(obj).__name__
    statics = {}
    kinds = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if v is None:
            continue
        if isinstance(v, jax.Array):
            arrays[f"{slot}::{f.name}"] = np.asarray(v)
            kinds[f.name] = "jax"
        elif isinstance(v, np.ndarray):
            arrays[f"{slot}::{f.name}"] = v
            kinds[f.name] = "np"
        elif isinstance(v, (int, float, bool, str)):
            statics[f.name] = v
        elif isinstance(v, tuple):
            statics[f.name] = {"__tuple__": [int(x) for x in v]}
        else:
            raise AoclSparseError(
                Status.internal_error, f"unserializable field {f.name}: {type(v)}"
            )
    manifest_entry["statics"] = statics
    manifest_entry["kinds"] = kinds


def _unpack_dataclass(cls, slot: str, npz, entry: Dict):
    kw = {}
    for name, val in entry["statics"].items():
        kw[name] = tuple(val["__tuple__"]) if isinstance(val, dict) else val
    for name, kind in entry["kinds"].items():
        arr = npz[f"{slot}::{name}"]
        kw[name] = jnp.asarray(arr) if kind == "jax" else arr
    return cls(**kw)


def _encode_key(key) -> list:
    return [int(k) if isinstance(k, (int, np.integer)) else k for k in key]


def save_plan(A, path: str) -> None:
    """Snapshot A's plan: exec forms and autotune pins. Effective CSRs and
    triangular forms are cheap to rebuild and are not stored."""
    from ..planner.plan import get_plan

    if A is None:
        raise AoclSparseError(Status.invalid_pointer, "null matrix handle")
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"  # np.savez appends it; keep load symmetric
    plan = get_plan(A)
    arrays: Dict[str, np.ndarray] = {}
    manifest = {
        "version": _FORMAT_VERSION,
        "sig": _struct_sig(plan),
        "exec_forms": [],
        "trsv_tuned": [
            [_encode_key(k), int(v)] for k, v in (getattr(plan, "_trsv_tuned", None) or {}).items()
        ],
        "trsv_engine": [
            [_encode_key(k), str(v)]
            for k, v in (getattr(plan, "_trsv_engine", None) or {}).items()
        ],
        "host_engine": bool(getattr(plan, "_host_engine", False)),
        "mv_engine": [
            [_encode_key(k), str(v)]
            for k, v in (getattr(plan, "_mv_engine", None) or {}).items()
        ],
        "mm_tuned": [
            [_encode_key(k), str(v)]
            for k, v in (getattr(plan, "_mm_tuned", None) or {}).items()
        ],
    }
    for i, (key, form) in enumerate(plan.exec_forms.items()):
        entry = {"key": _encode_key(key)}
        _pack_dataclass(form, f"ef{i}", arrays, entry)
        manifest["exec_forms"].append(entry)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_plan(A, path: str) -> int:
    """Rebuild A's plan from a snapshot of the SAME matrix structure
    (validated by size/index signature; mismatch -> invalid_value). Every
    restored form is refreshed from A's live values. Returns the number of
    forms restored."""
    from ..planner.plan import ExecForm, get_plan

    if A is None:
        raise AoclSparseError(Status.invalid_pointer, "null matrix handle")
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"
    npz = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(npz["__manifest__"]).decode())
    if manifest.get("version") != _FORMAT_VERSION:
        raise AoclSparseError(Status.invalid_value, "plan snapshot version mismatch")
    plan = get_plan(A)
    if _struct_sig(plan) != manifest["sig"]:
        raise AoclSparseError(
            Status.invalid_value, "plan snapshot belongs to a different matrix structure"
        )
    n_restored = 0
    for i, entry in enumerate(manifest["exec_forms"]):
        key = entry["key"]
        key_t = (key[0], key[1], key[2], Operation(key[3]), key[4])
        form = _unpack_dataclass(ExecForm, f"ef{i}", npz, entry)
        # values come from the LIVE handle, not the snapshot
        descr_like = MatrixDescriptor(
            type=key[0], fill_mode=key[1], diag_type=key[2]
        )
        eff = plan.effective_for(descr_like, Operation(key[3]), A.dtype)
        form.refresh(eff.val)
        plan.exec_forms[key_t] = form
        n_restored += 1
    tuned = {}
    for key, nb in manifest.get("trsv_tuned", []):
        tuned[(FillMode(key[0]), DiagType(key[1]), Operation(key[2]))] = int(nb)
    if tuned:
        plan._trsv_tuned = tuned
    eng = {}
    for key, name in manifest.get("trsv_engine", []):
        eng[(FillMode(key[0]), DiagType(key[1]), Operation(key[2]))] = str(name)
    if eng:
        plan._trsv_engine = eng
    if manifest.get("host_engine"):
        plan._host_engine = True
    mveng = {}
    for key, name in manifest.get("mv_engine", []):
        mveng[(key[0], key[1], key[2], Operation(key[3]))] = str(name)
    if mveng:
        plan._mv_engine = mveng
    mmt = {}
    for key, name in manifest.get("mm_tuned", []):
        mmt[
            (
                MatrixType(key[0]),
                FillMode(key[1]),
                DiagType(key[2]),
                Operation(key[3]),
                int(key[4]),
            )
        ] = str(name)
    if mmt:
        plan._mm_tuned = mmt
    return n_restored

