#!/bin/bash
# Watch for axon tunnel recovery; when a trivial fetch succeeds, run the
# headline bench once (warms the driver's compile cache and records a
# number), then exit. Single TPU process at all times.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 180 python -c "
import jax, numpy as np
import jax.numpy as jnp
b = jnp.ones((8,8), jnp.float32)
assert float(np.asarray((b*2)[0,0])) == 2.0
print('tunnel ok')
" >/tmp/tunnel_ok.log 2>&1; then
    echo "tunnel recovered at $(date)" >> /tmp/tunnel_watch.log
    AOCLSPARSE_TPU_BENCH_BASE_S=120 AOCLSPARSE_TPU_BENCH_CAP_S=300 \
      timeout 1500 python bench.py >> /tmp/tunnel_watch.log 2>&1
    echo "bench done at $(date)" >> /tmp/tunnel_watch.log
    exit 0
  fi
  echo "round $i: tunnel still down at $(date)" >> /tmp/tunnel_watch.log
  sleep 240
done
