#!/bin/bash
# Watch for axon tunnel recovery; when a trivial fetch succeeds, run the
# measurement chain once (headline bench -> suite sweep -> window hunt),
# then exit. Single TPU process at all times; everything under timeout so
# a re-stall cannot wedge the chain. A hard wall-clock budget (default 9 h)
# stops new TPU work well before the round driver's own bench run.
cd /root/repo
BUDGET_S=${WATCH_BUDGET_S:-32400}
END=$(( $(date +%s) + BUDGET_S ))
LOG=/tmp/tunnel_watch.log
left() { echo $(( END - $(date +%s) )); }

while [ "$(left)" -gt 600 ]; do
  if [ -f benchmarks/WATCH_STOP ]; then
    echo "watch stopped by stop file at $(date)" >> "$LOG"; exit 0
  fi
  if timeout 180 python -c "
import jax, numpy as np
import jax.numpy as jnp
b = jnp.ones((8,8), jnp.float32)
assert float(np.asarray((b*2)[0,0])) == 2.0
print('tunnel ok')
" >/tmp/tunnel_ok.log 2>&1; then
    echo "tunnel recovered at $(date)" >> "$LOG"
    AOCLSPARSE_TPU_BENCH_BASE_S=120 AOCLSPARSE_TPU_BENCH_CAP_S=300 \
      timeout 1500 python bench.py >> "$LOG" 2>&1
    echo "bench done at $(date)" >> "$LOG"
    [ -f benchmarks/WATCH_STOP ] && exit 0
    if [ "$(left)" -gt 3000 ]; then
      timeout 2400 python benchmarks/suite.py >> benchmarks/SUITE_r2.jsonl 2>>"$LOG"
      echo "suite done at $(date)" >> "$LOG"
    fi
    [ -f benchmarks/WATCH_STOP ] && exit 0
    H=$(( $(left) / 3600 ))
    if [ "$H" -ge 1 ]; then
      HUNT_HOURS=$H HUNT_GOOD_ROUNDS=4 \
        timeout $(( $(left) - 300 )) python benchmarks/hunt_window.py >> "$LOG" 2>&1
      echo "hunt done at $(date)" >> "$LOG"
    fi
    exit 0
  fi
  echo "tunnel still down at $(date)" >> "$LOG"
  sleep 240
done
echo "watch budget exhausted at $(date)" >> "$LOG"
