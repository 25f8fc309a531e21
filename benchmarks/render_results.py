#!/usr/bin/env python
"""Render measurement artifacts into a markdown table.

Usage: python benchmarks/render_results.py [SUITE_r2.jsonl ...]

Reads suite JSONL records (one dict per line, as printed by
benchmarks/suite.py) and prints a RESULTS-style markdown table with the
roofline/achievable context, so updating RESULTS_r*.md after the watcher's
measurement chain (tunnel_watch.sh) is one copy-paste. Records missing a
rate field are listed raw. No TPU access; pure host formatting."""

import json
import sys
from pathlib import Path


def main():
    paths = [Path(p) for p in sys.argv[1:]] or [Path(__file__).parent / "SUITE_r2.jsonl"]
    rows = []
    for path in paths:
        if not path.exists():
            print(f"(missing: {path})", file=sys.stderr)
            continue
        for line in path.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if not rows:
        print("no records")
        return
    # flatten nested "extra" dicts into the record
    flat = []
    for r in rows:
        fr = dict(r)
        ex = fr.pop("extra", None)
        if isinstance(ex, dict):
            for k, v in ex.items():
                fr.setdefault(k, v)
        flat.append(fr)
    rows = flat
    keys = ["op", "profile", "metric", "probe", "value", "unit", "gnnz_per_s", "gbs_eff",
            "stream_gbps", "window_stream_gbps", "vs_achievable", "vs_baseline",
            "t_us", "t_iter_us", "iters", "error"]
    present = [k for k in keys if any(k in r for r in rows)]
    print("| " + " | ".join(present) + " |")
    print("|" + "---|" * len(present))
    for r in rows:
        cells = []
        for k in present:
            v = r.get(k, "")
            if isinstance(v, float):
                v = f"{v:.4g}"
            cells.append(str(v))
        print("| " + " | ".join(cells) + " |")
    extra = [r for r in rows if not any(k in r for k in ("op", "metric"))]
    if extra:
        print("\nunclassified records:")
        for r in extra[:20]:
            print(" ", json.dumps(r)[:200])


if __name__ == "__main__":
    main()
