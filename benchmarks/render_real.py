#!/usr/bin/env python
"""Render benchmarks/REAL_r4.jsonl into the RESULTS_r4 per-matrix table
(latest row per (matrix, op) wins — re-runs supersede)."""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main(path=None):
    path = path or os.path.join(HERE, "REAL_r4.jsonl")
    latest = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "matrix" in r and "op" in r:
            latest[(r["matrix"], r["op"])] = r
    mats = []
    for (m, _), _r in latest.items():
        if m not in mats:
            mats.append(m)
    cols = ["plan", "mv_f32", "mv_bf16", "mv_pspace", "mm_k64", "trsv_lower",
            "sp2m", "ilu0_factor", "cg"]
    print("| matrix | " + " | ".join(cols) + " |")
    print("|" + "---|" * (len(cols) + 1))
    for m in mats:
        cells = [m]
        for op in cols:
            r = latest.get((m, op))
            if r is None:
                cells.append("—")
            elif "error" in r:
                cells.append("err: " + r["error"][:40])
            elif op == "plan":
                cells.append(f"{r.get('form')} W={r.get('W')} ({r.get('t_s')}s)")
            elif op.startswith("mv"):
                g = r.get("gnnz_s")
                cells.append(f"{g} Gnnz/s" if g is not None else "—")
            elif op == "mm_k64":
                cells.append(f"{r.get('t_ms')} ms ({r.get('loop')})")
            elif op == "trsv_lower":
                cells.append(f"{r.get('gflops')} GF/s")
            elif op == "sp2m" and r.get("skipped"):
                cells.append(
                    f"skipped ({r.get('predicted_products', 0):.1e} pred products)"
                )
            elif op == "sp2m":
                w = r.get("t_warm_s")
                cells.append(f"{r.get('t_s')}s cold" + (f", {w}s warm" if w else ""))
            elif op == "ilu0_factor":
                cells.append(f"{r.get('t_s')}s")
            elif op == "cg":
                s = r.get("ms_per_iter_slope")
                cells.append(f"slope {s} ms/it" if s is not None else "—")
        print("| " + " | ".join(str(c) for c in cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
