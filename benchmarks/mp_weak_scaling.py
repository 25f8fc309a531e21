"""Measured weak-scaling rehearsal (VERDICT r4 item 8): the same 8-device
band-CG run with and without a 2-process gloo (DCN-analog) boundary.

Launches benchmarks/mp_weak_worker.py in both topologies, computes
efficiency = slope(1 proc) / slope(2 proc), and records the row in
MULTICHIP_LEDGER.json next to the model-predicted efficiencies. CPU-only —
safe to run alongside a TPU bench."""

import json
import os
import re
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mp_weak_worker.py")
LEDGER = os.path.join(os.path.dirname(HERE), "MULTICHIP_LEDGER.json")
M = int(os.environ.get("MP_WEAK_M", "16384"))


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def slope_of(outputs):
    for line in outputs.splitlines():
        mt = re.match(r"SLOPE ([0-9.]+)", line.strip())
        if mt:
            return float(mt.group(1))
    raise RuntimeError(f"no SLOPE line in: {outputs[-2000:]}")


def run_single():
    r = subprocess.run(
        [sys.executable, WORKER, "1", "0", "0", str(M)],
        capture_output=True, text=True, timeout=900,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return slope_of(r.stdout)


def run_two_proc():
    port = free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "2", str(pid), str(port), str(M)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(err[-2000:])
        outs.append(out)
    return slope_of(outs[0])


def main():
    t0 = time.time()
    s1 = run_single()
    s2 = run_two_proc()
    eff = s1 / s2 if s2 > 0 else None
    row = {
        "m": M,
        "path": "dist_cg_bwd_halo",
        "ms_per_iter_1proc_8dev": round(s1, 4),
        "ms_per_iter_2proc_gloo": round(s2, 4),
        "weak_efficiency_measured": None if eff is None else round(eff, 4),
        "note": "same global 8-CPU-device mesh; the 2-proc run crosses a"
        " gloo TCP boundary where a pod run would cross DCN — methodology"
        " rehearsal for predict_weak_scaling, not an ICI measurement",
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(row), flush=True)
    led = json.load(open(LEDGER))
    led["measured_gloo_weak_scaling"] = row
    json.dump(led, open(LEDGER, "w"), indent=1)


if __name__ == "__main__":
    main()
