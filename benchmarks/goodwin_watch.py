#!/usr/bin/env python
"""Standing good-window trap (VERDICT r4 item 2b): poll the pool's stream
bandwidth; when a window >= THRESH GB/s appears, fire the headline bench
(hot-calibrated) and the pcg-262k probe, then keep watching until the
budget runs out or benchmarks/WATCH_STOP exists. ONE TPU process: run this
only when nothing else is on the chip.

Env: GOODWIN_THRESH (default 300 GB/s), GOODWIN_BUDGET_S (default 3600),
GOODWIN_POLL_S (default 90)."""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LOG = os.path.join(HERE, "GOODWIN_r5.jsonl")


def emit(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    thresh = float(os.environ.get("GOODWIN_THRESH", "300"))
    budget = float(os.environ.get("GOODWIN_BUDGET_S", "3600"))
    poll = float(os.environ.get("GOODWIN_POLL_S", "90"))
    end = time.time() + budget

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(1)
    buf = jnp.asarray(rng.standard_normal(32 * 1024 * 1024).astype(np.float32))

    @jax.jit
    def stream(b, a0):
        def body(i, acc):
            return jnp.sum(b * (1.0 + 1e-30 * acc))

        return jax.lax.fori_loop(0, 16, body, a0)

    float(stream(buf, jnp.float32(0.0)))
    fired = 0
    while time.time() < end:
        if os.path.exists(os.path.join(HERE, "WATCH_STOP")):
            emit({"event": "stopped_by_file", "ts": time.time()})
            return
        float(stream(buf, jnp.float32(0.0)))  # pre-warm
        t0 = time.perf_counter()
        for _ in range(3):
            z = stream(buf, jnp.float32(0.0))
        float(z)
        gbps = buf.size * 4 / ((time.perf_counter() - t0) / 48) / 1e9
        emit({"event": "poll", "stream_gbps": round(gbps, 1), "ts": time.time()})
        if gbps >= thresh:
            emit({"event": "fire", "stream_gbps": round(gbps, 1)})
            # the bench subprocess owns the TPU while it runs; this process
            # only resumes polling after it exits
            env = dict(os.environ, AOCLSPARSE_TPU_BENCH_BASE_S="90",
                       AOCLSPARSE_TPU_BENCH_CAP_S="240")
            r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                               capture_output=True, text=True, timeout=1500, env=env)
            for ln in r.stdout.splitlines():
                if ln.startswith("{"):
                    emit({"event": "bench", "line": json.loads(ln)})
            r2 = subprocess.run(
                [sys.executable, os.path.join(HERE, "probe_pcg262.py")],
                capture_output=True, text=True, timeout=1500,
                env=dict(os.environ, PCG262_ROUNDS="2"),
            )
            for ln in r2.stdout.splitlines():
                if ln.startswith("{"):
                    emit({"event": "pcg262", "line": json.loads(ln)})
            fired += 1
            if fired >= int(os.environ.get("GOODWIN_MAX_FIRES", "3")):
                emit({"event": "done_max_fires"})
                return
        time.sleep(poll)
    emit({"event": "budget_exhausted"})


if __name__ == "__main__":
    main()
