#!/bin/bash
# Round-5 targeted re-runs after the sweep-found fixes landed:
#   circuit5M  — full (first run OOM'd on the vt4 relayout; v2 gate landed)
#   rajat31    — mm/trsv/sp2m (plan-ref leak + b_t NameError + K-pad fixes)
#   in-2004    — mm (gen W<=TM fix)
#   ldoor      — cg (fused-solver consts-as-args fix)
#   bone010    — sp2m/ilu/cg (memory-aware product cap; OOM-killed first try)
# then the on-chip probes: route engine (bone010), SpGEMM extraction, and
# the good-window watch with the pcg262 row. ONE TPU process at a time.
cd /root/repo
T=${FIXUP_PER_STEP_S:-4200}
run() { echo "=== $* $(date) ==="; timeout "$T" env "$@" python benchmarks/run_real.py; echo "=== rc=$? $(date) ==="; }
[ -f benchmarks/SWEEP_STOP ] && exit 0
run REAL_ONLY=circuit5M
run REAL_ONLY=rajat31 REAL_OPS=mm,trsv,sp2m
run REAL_ONLY=in-2004 REAL_OPS=mm
run REAL_ONLY=ldoor REAL_OPS=cg
run REAL_ONLY=bone010 REAL_OPS=sp2m,ilu,cg
echo "=== probe_route_mv $(date) ==="
timeout 3000 python benchmarks/probe_route_mv.py
echo "=== probe_extract $(date) ==="
timeout 2400 python benchmarks/probe_extract.py
echo "=== probe_pcg262 $(date) ==="
timeout 1800 python benchmarks/probe_pcg262.py
echo "=== goodwin_watch $(date) ==="
GOODWIN_BUDGET_S=${GOODWIN_BUDGET_S:-2400} timeout 4200 python benchmarks/goodwin_watch.py
echo "=== fixups complete $(date) ==="
