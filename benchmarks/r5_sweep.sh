#!/bin/bash
# Round-5 real-matrix sweep driver: runs benchmarks/run_real.py for each
# named stand-in sequentially (ONE TPU process at a time), honoring
#   benchmarks/SWEEP_STOP   — exit before starting the next matrix
#   benchmarks/SWEEP_PAUSE  — wait (poll 30 s) before starting the next
# Per-matrix timeout guards a wedged tunnel. Usage:
#   bash benchmarks/r5_sweep.sh cant pwtk scircuit
cd /root/repo
PER_MATRIX_S=${SWEEP_PER_MATRIX_S:-3600}
for name in "$@"; do
  while [ -f benchmarks/SWEEP_PAUSE ]; do sleep 30; done
  [ -f benchmarks/SWEEP_STOP ] && { echo "sweep stopped before $name"; exit 0; }
  echo "=== $name start $(date) ==="
  REAL_ONLY=$name timeout "$PER_MATRIX_S" python benchmarks/run_real.py
  echo "=== $name done rc=$? $(date) ==="
done
echo "=== sweep complete $(date) ==="
